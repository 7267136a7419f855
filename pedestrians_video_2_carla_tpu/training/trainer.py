"""Training loop: jit-compiled flow steps over a device mesh, checkpointing on
the monitored metric, metric accumulation and scalar logging.

Replaces the reference's ``pytorch_lightning.Trainer`` usage (``modeling.py:
275-302``): fit/validate/test/predict with ``val_loss/primary`` best-checkpoint
monitoring (reference ``modeling.py:240-245``), initial metrics at fit start
(reference ``flow/base.py:226-298``), epoch-end metric logging. Data-parallel
scaling comes from jitting the flow's pure steps with batches sharded over the
mesh's ``data`` axis.
"""
import math
import os
import sys
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

import jax
import numpy as np

from ..flows.base import BaseFlow, FlowState
from ..parallel.mesh import (MeshConfig, constrain_batch, make_mesh,
                             shard_batch, shard_state, state_shardings)
from .checkpoint import CheckpointManager
from .loggers import MetricsLogger


@dataclass
class TrainerConfig:
    max_epochs: int = 1
    limit_train_batches: Optional[int] = None
    limit_val_batches: Optional[int] = None
    limit_test_batches: Optional[int] = None
    log_every_n_steps: int = 50
    check_val_every_n_epoch: int = 1
    monitor: str = "val_loss/primary"
    monitor_mode: str = "min"
    seed: int = 22742
    mesh: MeshConfig = field(default_factory=MeshConfig)
    logs_dir: str = "outputs/logs"
    run_name: str = "run"
    skip_initial_metrics: bool = False
    #: Lightning's --detect_anomaly equivalent: check logged losses for
    #: NaN/inf at every log interval; on anomaly, dump which loss terms and
    #: param leaves are non-finite and abort the run (a masked loss can stay
    #: finite-looking while params are already NaN — see CLAUDE.md)
    detect_anomaly: bool = False
    #: "auto"/"tensorboard" = jsonl+TB; "wandb" = additionally write a W&B
    #: offline run directory (reference's primary logger is WandbLogger,
    #: ``modeling.py:194-224``; see loggers.WandbOfflineLogger)
    logger: str = "auto"


class Trainer:
    def __init__(self, flow: BaseFlow, datamodule, config: TrainerConfig,
                 video_logger=None):
        self.flow = flow
        self.dm = datamodule
        self.config = config
        self.mesh = make_mesh(config.mesh)
        self.state: Optional[FlowState] = None
        #: optional PedestrianLogger for qualitative mp4s (reference wires it
        #: as a second Lightning logger, ``flow/base.py:489-510``)
        self.video_logger = video_logger

        #: rank-zero guard: only the first host writes checkpoints/logs
        #: (reference relies on Lightning's rank_zero_only decorators,
        #: ``flow/base.py:226``)
        self.is_main_process = jax.process_index() == 0
        self.log_dir = os.path.join(config.logs_dir, config.run_name)
        if self.is_main_process:
            os.makedirs(self.log_dir, exist_ok=True)
        if config.logger == "wandb":
            from .loggers import WandbOfflineLogger
            self.logger = WandbOfflineLogger(
                self.log_dir, enabled=self.is_main_process,
                run_id=config.run_name, argv=sys.argv)
        else:
            self.logger = MetricsLogger(self.log_dir,
                                        enabled=self.is_main_process)
        self.checkpoints = CheckpointManager(
            os.path.join(self.log_dir, "checkpoints"),
            monitor=config.monitor, mode=config.monitor_mode,
            enabled=self.is_main_process)

        self._train_step = None
        self._eval_step = None
        self._metric_update = None
        self._loss_add = None

    # ------------------------------------------------------------------
    def _build_steps(self):
        """Jit the pure flow steps over the mesh with *persistent* state
        shardings: params/opt-state enter AND leave with the tensor-parallel
        layout from ``parallel.mesh.state_shardings`` (out_shardings pins it,
        so XLA cannot re-gather between steps) and the batch layout is pinned
        in-jit via ``with_sharding_constraint``."""
        flow = self.flow
        mesh = self.mesh
        sshard = state_shardings(mesh, self.state) \
            if self.state is not None else None
        self._state_shardings = sshard
        self._scan_runners = {}  # k -> scan-folded resident epoch runner

        def train_step(state, batch, rng):
            return flow.training_step(state, constrain_batch(mesh, batch),
                                      rng)

        def eval_step(state, batch):
            return flow.eval_step(state, constrain_batch(mesh, batch))

        def metric_update(mstate, preds, targets):
            return flow.metrics.update(mstate, preds, targets)

        self._train_step = jax.jit(
            train_step, donate_argnums=(0,),
            out_shardings=(sshard, None) if sshard is not None else None)
        self._eval_step = jax.jit(eval_step)
        self._metric_update = jax.jit(metric_update)
        import jax.numpy as jnp
        self._loss_add = jax.jit(
            lambda a, b: jax.tree_util.tree_map(jnp.add, a, b))

    def _init_state(self):
        first = next(iter(self.dm.val_batches()), None)
        if first is None:
            first = next(iter(self.dm.train_batches(self.config.seed)))
        if self.state is None:  # keep a state restored via --ckpt_path
            # epoch-granularity LR schedulers (the reference's Lightning
            # interval='epoch') need the epoch length BEFORE the optimizer
            # is built; fill it in from the datamodule unless the flow was
            # constructed with an explicit value
            if getattr(self.flow, "steps_per_epoch", 1) == 1:
                spe = self._resolve_train_batches()
                if spe is None:
                    n = self.dm.train_set_size
                    bs = getattr(self.dm, "batch_size", None)
                    if n and bs:
                        spe = max(1, n // bs)
                if spe:
                    self.flow.steps_per_epoch = max(1, int(spe))
            key = jax.random.PRNGKey(self.config.seed)
            state = self.flow.init_state(key, first)
            self.state = shard_state(self.mesh, state)
        return first

    def _resolve_train_batches(self) -> Optional[int]:
        limit = self.config.limit_train_batches
        if limit is None and self.dm.uses_infinite_train_set():
            # guard against infinite streams (reference modeling.py:366-381)
            val_size = self.dm.val_set_size or self.dm.batch_size
            limit = int(math.ceil(4 * val_size / self.dm.batch_size))
        return limit

    # ------------------------------------------------------------------
    def fit(self):
        sample = self._init_state()
        self._build_steps()

        if self.is_main_process:
            # fit-start model summary (reference attaches Lightning's
            # ModelSummary callback, modeling.py:240-247)
            counts = self.flow.param_counts(self.state)
            print("  | model      | params\n  " + "\n  ".join(
                f"| {k:<10} | {v:,}" for k, v in counts.items()))
        if self.is_main_process:
            # hparams + param counts always log; only the baseline metrics
            # pass itself is gated by --skip_initial_metrics
            initial = {} if self.config.skip_initial_metrics \
                else self._initial_metrics()
            self.logger.log_hparams({
                **self.dm.hparams, **initial,
                **{f"params/{k}": v for k, v in counts.items()}})

        limit = self._resolve_train_batches()
        # RBG dropout stream: threefry mask generation measured ~46% of a
        # dropout-heavy train step on TPU (utils/rng.py)
        from ..utils.rng import training_rng
        rng = training_rng(self.config.seed + 7)
        global_step = 0
        summary: Dict[str, Any] = {}

        with self.mesh:
            for epoch in range(self.config.max_epochs):
                if self.flow.on_epoch_start(epoch):
                    self._build_steps()  # traced constants changed
                epoch_start = time.perf_counter()
                # device-resident train subsets run the epoch scan-folded
                # (K steps per dispatch) unless training-time video logging
                # needs per-batch host materialization
                scan_spec = None
                if self.video_logger is None:
                    spec_fn = getattr(self.dm, "resident_scan_inputs", None)
                    if spec_fn is not None:
                        scan_spec = spec_fn("train", shuffle=True,
                                            training=True,
                                            seed=self.config.seed + epoch)
                if scan_spec is not None:
                    last_logs, global_step = self._fit_epoch_scanned(
                        scan_spec, limit, rng, global_step)
                else:
                    last_logs, global_step = self._fit_epoch_streamed(
                        limit, rng, global_step, epoch)

                epoch_time = time.perf_counter() - epoch_start
                summary = {"epoch": epoch, "epoch_time_s": epoch_time}
                if last_logs is not None:
                    host_logs = jax.device_get(last_logs)
                    summary.update(
                        {k: float(v) for k, v in host_logs.items()})

                if (epoch + 1) % self.config.check_val_every_n_epoch == 0:
                    val_metrics = self.evaluate(
                        "val", self.config.limit_val_batches)
                    summary.update(val_metrics)
                    self.checkpoints.save(
                        self.state, val_metrics, step=global_step)

                self.logger.log_scalars(global_step, summary)

        # sweep-objective aliases (reference sweeps target e.g. hp/PCKhn@01)
        hp = {f"hp/{k.split('/', 1)[1]}": v for k, v in summary.items()
              if isinstance(v, (int, float)) and k.startswith("val/")}
        if hp:
            self.logger.log_hparams(hp)
        # join async checkpoint writes (and surface any write error) before
        # declaring the fit done
        self.checkpoints.wait()
        return self.state

    def _fit_epoch_streamed(self, limit, rng, global_step, epoch):
        """The per-batch training epoch: datamodule iterator -> background
        host->device prefetch -> one jitted train step per batch."""
        train_iter = self.dm.train_batches(self.config.seed + epoch)
        if limit is not None:
            import itertools
            train_iter = itertools.islice(train_iter, limit)
        # background host->device prefetch overlapping device compute
        from ..runtime.prefetcher import DevicePrefetcher
        train_iter = DevicePrefetcher(
            train_iter, put_fn=lambda b: shard_batch(self.mesh, b))
        # keep only the most recent step's device logs (retaining
        # every step's logs for a whole epoch pins device memory) and
        # sync to host only at the throttled log interval
        last_logs = None
        for batch_idx, batch in enumerate(train_iter):
            self.state, logs = self._train_step(
                self.state, batch, rng)
            global_step += 1
            last_logs = logs
            if global_step % self.config.log_every_n_steps == 0:
                host_logs = jax.device_get(logs)
                self.logger.log_scalars(
                    global_step,
                    {**{k: float(v) for k, v in host_logs.items()},
                     # per-step effective lrs (reference
                     # LearningRateMonitor)
                     **self.flow.current_lrs(self.state)})
                if self.config.detect_anomaly:
                    self._check_anomaly(host_logs, global_step)
            # throttled training-time qualitative videos (reference
            # ``flow/base.py:489-510`` logs videos during training
            # through the PedestrianLogger's step throttle); the
            # projections come from one extra eval pass on the
            # current train batch, paid only at throttle hits
            if self.video_logger is not None \
                    and self.is_main_process \
                    and self.video_logger.should_log(global_step):
                self._log_train_videos(batch, global_step, batch_idx)
        return last_logs, global_step

    def _fit_epoch_scanned(self, spec, limit, rng, global_step):
        """Device-resident training epoch, scan-folded: chunks of
        K = log_every_n_steps train steps run as ONE jitted
        ``lax.scan(gather + preprocess + step)`` dispatch with donated
        state (``runtime/resident_scan.py``) — per-batch host dispatch
        cost drops to ~1/K. Per-step scalar logs come back stacked, so
        the logging cadence and ``--detect_anomaly`` see exactly the same
        values as per-batch iteration (schedule-based lrs are recomputed
        at each hit's own step via ``current_lrs(at_step=...)``; the
        plateau scale moves once per epoch, so chunk-end state is exact
        for it)."""
        from ..runtime.resident_scan import build_scan_runner
        gather, key, order_d, num_batches, trees = spec
        nb = num_batches if limit is None else min(limit, num_batches)
        K = max(1, min(self.config.log_every_n_steps, nb))
        last_logs = None
        b0 = 0
        while b0 < nb:
            k = min(K, nb - b0)
            runner = self._scan_runners.get(k)
            if runner is None:
                runner = self._scan_runners[k] = build_scan_runner(
                    self.flow, gather, k,
                    constrain=lambda b: constrain_batch(self.mesh, b),
                    state_shardings=self._state_shardings)
            self.state, logs_stack = runner(self.state, rng, key, order_d,
                                            b0, *trees)
            hits = [j for j in range(k)
                    if (global_step + j + 1)
                    % self.config.log_every_n_steps == 0]
            if hits:
                host = jax.device_get(logs_stack)
                for j in hits:
                    step_logs = {kk: float(v[j]) for kk, v in host.items()}
                    self.logger.log_scalars(
                        global_step + j + 1,
                        {**step_logs, **self.flow.current_lrs(
                            self.state, at_step=global_step + j + 1)})
                    if self.config.detect_anomaly:
                        self._check_anomaly(step_logs, global_step + j + 1)
            global_step += k
            b0 += k
            last_logs = jax.tree_util.tree_map(lambda x: x[-1], logs_stack)
        return last_logs, global_step

    def _check_anomaly(self, host_logs, global_step: int) -> None:
        """--detect_anomaly: abort with a diagnostic when a logged loss OR
        any parameter goes non-finite (params are checked too because masked
        losses can stay finite-looking after params NaN)."""
        bad_losses = [k for k, v in host_logs.items()
                      if not np.isfinite(float(v))]
        flat = jax.tree_util.tree_flatten_with_path(
            jax.device_get(self.state.params))[0]
        bad_params = [jax.tree_util.keystr(path) for path, leaf in flat
                      if hasattr(leaf, "dtype")
                      and np.issubdtype(leaf.dtype, np.floating)
                      and not np.isfinite(leaf).all()]
        if not bad_losses and not bad_params:
            return
        report = {"step": global_step, "non_finite_losses": bad_losses,
                  "non_finite_params": bad_params[:50]}
        if self.is_main_process:
            import json
            with open(os.path.join(self.log_dir, "anomaly.json"), "w") as f:
                json.dump(report, f, indent=1)
        raise RuntimeError(
            f"detect_anomaly: non-finite at step {global_step}: "
            f"losses={bad_losses} params={bad_params[:5]}"
            f"{'...' if len(bad_params) > 5 else ''} "
            f"(full report in {self.log_dir}/anomaly.json)")

    def _tb_video_callback(self, step: int):
        """Forward rendered clips to TensorBoard alongside the mp4s
        (reference ``flow/base.py:480-487``)."""
        def cb(video, clip_idx, fps, stage, meta):
            self.logger.log_video(f"{stage}/video_{clip_idx}", video,
                                  step, fps)
        return cb

    def _log_train_videos(self, batch, global_step: int, batch_idx: int):
        try:
            _, preds, targets = self._eval_step(self.state, batch)
            self.video_logger.log_videos(
                inputs=np.asarray(batch[0]),
                targets=jax.tree_util.tree_map(np.asarray, targets),
                projections=jax.tree_util.tree_map(
                    np.asarray,
                    {k: v for k, v in preds.items() if v is not None}),
                meta=jax.tree_util.tree_map(np.asarray, batch[2]),
                step=global_step, batch_idx=batch_idx, stage="train",
                force=True,  # should_log already applied the throttle
                vid_callback=self._tb_video_callback(global_step))
        except Exception as e:  # rendering must never kill a run
            import warnings
            warnings.warn(f"train video logging failed: {e}")

    # ------------------------------------------------------------------
    def evaluate(self, stage: str = "val",
                 limit: Optional[int] = None) -> Dict[str, float]:
        batches = self.dm.val_batches() if stage == "val" \
            else self.dm.test_batches()
        mstate = self.flow.metrics.init_state()
        # losses accumulate ON DEVICE (one jnp.add tree per batch); the host
        # syncs exactly once per eval pass instead of once per loss per batch
        loss_sums = None
        count = 0
        with self.mesh:
            for batch_idx, batch in enumerate(batches):
                if limit is not None and batch_idx >= limit:
                    break
                host_meta = batch[2]  # pre-shard: keeps string meta
                batch = shard_batch(self.mesh, batch)
                loss_dict, preds, targets = self._eval_step(self.state, batch)
                mstate = self._metric_update(mstate, preds, targets)
                loss_sums = loss_dict if loss_sums is None \
                    else self._loss_add(loss_sums, loss_dict)
                count += 1
                if batch_idx == 0 and self.video_logger is not None \
                        and self.is_main_process:
                    try:
                        self.video_logger.log_videos(
                            inputs=np.asarray(batch[0]),
                            targets=jax.tree_util.tree_map(np.asarray,
                                                           targets),
                            projections=jax.tree_util.tree_map(
                                np.asarray,
                                {k: v for k, v in preds.items()
                                 if v is not None}),
                            meta=jax.tree_util.tree_map(np.asarray,
                                                        host_meta),
                            step=int(self.state.step), batch_idx=batch_idx,
                            stage=stage, force=(stage != "train"),
                            vid_callback=self._tb_video_callback(
                                int(self.state.step)))
                    except Exception as e:  # rendering must never kill a run
                        import warnings
                        warnings.warn(f"video logging failed: {e}")

        results: Dict[str, float] = {}
        if count:
            loss_sums = jax.device_get(loss_sums)  # the single host sync
            for k, v in loss_sums.items():
                results[f"{stage}_loss/{k}"] = float(v) / count
            primary = next((f"{stage}_loss/{m.name}"
                            for m in self.flow.requested_loss_modes
                            if f"{stage}_loss/{m.name}" in results), None)
            if primary:
                results[f"{stage}_loss/primary"] = results[primary]
            computed = _compute_moved_metrics(self.flow.metrics, mstate)
            results.update(_flatten_metrics(computed, stage))
            if self.is_main_process:
                # classification plot artifacts (confusion/ROC/PR PNGs) —
                # the offline stand-in for the reference's W&B plots
                # (``classification.py:336-436``); no-op for other flows
                try:
                    from .plots import save_classification_plots
                    save_classification_plots(
                        jax.tree_util.tree_map(np.asarray, computed),
                        os.path.join(self.log_dir, "plots"), stage,
                        int(self.state.step))
                except Exception as e:  # plotting must never kill a run
                    import warnings
                    warnings.warn(f"classification plots failed: {e}")
        return results

    def test(self) -> Dict[str, float]:
        if self._eval_step is None:
            self._init_state()
            self._build_steps()
        results = self.evaluate("test", self.config.limit_test_batches)
        self.logger.log_scalars(-1, results)
        return results

    def restore_torch(self, path: str, model_name: str):
        """Import a torch/Lightning checkpoint's movements-model weights
        (weight-compatibility requirement for LinearAE / Seq2SeqEmbeddings /
        VideoPose3D / PoseFormer; reference restores via
        ``load_from_checkpoint``, ``modeling.py:250-265``)."""
        from ..models.torch_import import IMPORTERS, load_torch_checkpoint
        if model_name not in IMPORTERS:
            raise ValueError(
                f"no torch weight importer for {model_name!r}; available: "
                f"{sorted(IMPORTERS)}")
        sd = load_torch_checkpoint(path, prefix="movements_model.")
        if not sd:
            sd = load_torch_checkpoint(path)
        out = IMPORTERS[model_name](sd)
        params, batch_stats = out if isinstance(out, tuple) else (out, None)
        if self.state is None:
            self._init_state()
            self._build_steps()
        new_params = dict(self.state.params)
        new_params["movements"] = params
        new_mutables = dict(self.state.mutables)
        if batch_stats is not None:
            new_mutables["movements"] = {"batch_stats": batch_stats}
        self.state = shard_state(self.mesh, self.state.replace(
            params=new_params, mutables=new_mutables))

    def restore_pretrained_backbone(self, path: str,
                                    module_name: str = "ResNet_0"):
        """Inject torchvision ResNet pretrained weights into the
        pose-estimation model's backbone (reference
        ``modules/pose_estimation/unipose/overrides.py:33-46`` — torchvision
        ``resnet50/101(pretrained=True)`` state_dict into the UniPose
        backbone). ``path`` is a local torch ``.pth`` state_dict (no network
        here; download once elsewhere)."""
        from ..models.torch_import import (graft_resnet_backbone,
                                           load_torch_checkpoint)
        sd = load_torch_checkpoint(path)
        if self.state is None:
            self._init_state()
            self._build_steps()
        params = dict(self.state.params)
        mutables = dict(self.state.mutables)
        mov_mut = dict(mutables.get("movements") or {})
        new_mov_params, new_bn_stats = graft_resnet_backbone(
            sd, params["movements"], mov_mut.get("batch_stats"),
            module_name=module_name)
        params["movements"] = new_mov_params
        mov_mut["batch_stats"] = new_bn_stats
        mutables["movements"] = mov_mut
        self.state = shard_state(self.mesh, self.state.replace(
            params=params, mutables=mutables))

    def restore(self, path: str, weights_only: bool = False):
        """Load a checkpoint; ``weights_only`` keeps a fresh optimizer state
        (reference 'tune' mode reloads weights only, ``modeling.py:281-285``)."""
        if self.state is None:
            self._init_state()
            self._build_steps()
        loaded = self.checkpoints.restore(self.state, path)
        if weights_only:
            self.state = self.state.replace(params=loaded.params,
                                            mutables=loaded.mutables)
        else:
            self.state = loaded
        self.state = shard_state(self.mesh, self.state)

    def predict(self, set_name: str = "test") -> List[Any]:
        if self._eval_step is None:
            self._init_state()
            self._build_steps()
        outputs = []
        with self.mesh:
            for batch in self.dm.predict_batches(set_name):
                batch = shard_batch(self.mesh, batch)
                _, preds, targets = self._eval_step(self.state, batch)
                outputs.append(jax.tree_util.tree_map(
                    np.asarray, (preds, targets, batch[2])))
        return outputs

    # ------------------------------------------------------------------
    def _initial_metrics(self) -> Dict[str, float]:
        """Input-as-prediction baseline metrics over the val set (reference
        ``flow/base.py:258-298``)."""
        collection = self.flow.initial_metrics
        if not len(collection):
            return {}
        mstate = collection.init_state()
        update = jax.jit(collection.update)
        any_batches = False
        for batch in self.dm.val_batches():
            inputs, targets, meta = batch
            preds = self.flow.initial_preds(inputs, targets)
            if not preds:
                break
            mstate = update(mstate, preds, targets)
            any_batches = True
        if not any_batches:
            return {}
        computed = _compute_moved_metrics(collection, mstate)
        return _flatten_metrics(computed, "initial")


def _compute_moved_metrics(collection, mstate) -> Dict[str, Any]:
    """Compute the collection, dropping metrics whose accumulator never
    moved off its init state — a metric whose ``update`` skipped every batch
    (3D MPJPE fed 2D preds, FB metrics under mismatched skeletons) must be
    ABSENT from the logs, not reported as a fake-perfect 0.0. The reference
    skips those on KeyError instead of logging 0."""
    init = collection.init_state()
    computed = collection.compute(mstate)
    for name in list(computed):
        if name in init and name in mstate:
            unchanged = all(
                np.array_equal(np.asarray(a), np.asarray(b))
                for a, b in zip(jax.tree_util.tree_leaves(init[name]),
                                jax.tree_util.tree_leaves(mstate[name])))
            if unchanged:
                del computed[name]
    return computed


def _flatten_metrics(computed: Dict[str, Any], stage: str) -> Dict[str, Any]:
    def to_scalar_or_list(v):
        v = np.asarray(v)
        return float(v) if v.ndim == 0 else v.tolist()

    out = {}
    for name, value in computed.items():
        if isinstance(value, dict):
            for k, v in value.items():
                out[f"{stage}/{name}/{k}"] = to_scalar_or_list(v)
        else:
            out[f"{stage}/{name}"] = to_scalar_or_list(value)
    return out
