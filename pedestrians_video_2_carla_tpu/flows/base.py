"""Base flow: model bundle + loss chain + metrics + pure train/eval steps.

Re-designs reference ``modules/flow/base.py:33-511`` (``LitBaseFlow``) without
Lightning: a flow owns its flax models and loss/metric configuration and
exposes *pure functions* (``training_step`` / ``eval_step``) over an explicit
``FlowState`` pytree. The trainer jits these over a device mesh with the batch
sharded on the data axis — the moral equivalent of the reference's DDP, with
gradient all-reduce inserted by XLA instead of NCCL hooks.
"""
from typing import Any, Dict, List, Optional, Tuple

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..losses import (LossContext, LossModes, calculate_losses, primary_loss,
                      resolve_loss_modes)
from ..metrics.base import MetricCollection
from ..models.base import OptimizerSettings
from ..models.movements.zero import ZeroMovements
from ..models.trajectory.zero import ZeroTrajectory
from .output_types import MovementsModelOutputType


@flax.struct.dataclass
class FlowState:
    params: Dict[str, Any]
    mutables: Dict[str, Any]          # batch_stats etc. per model
    opt_state: Any
    step: jnp.ndarray


class BaseFlow:
    """Common flow machinery. Subclasses define ``_inner_step`` and metric/
    model sets (reference subclass contract, ``base.py:125-151``)."""

    def __init__(self,
                 movements_model=None,
                 trajectory_model=None,
                 loss_modes: Optional[List] = None,
                 loss_weights: Optional[Dict[str, float]] = None,
                 loss_params: Optional[List[float]] = None,
                 mask_missing_joints: bool = True,
                 movements_optimizer: Optional[OptimizerSettings] = None,
                 trajectory_optimizer: Optional[OptimizerSettings] = None,
                 transform: str = "hips_neck",
                 precision: str = "32",
                 gradient_clip_val: float = 0.0,
                 projection_kernel: str = "xla",
                 steps_per_epoch: int = 1,
                 **kwargs):
        self.movements_model = movements_model \
            if movements_model is not None else ZeroMovements()
        self.trajectory_model = trajectory_model \
            if trajectory_model is not None else ZeroTrajectory()
        self.mask_missing_joints = mask_missing_joints
        self.loss_weights = loss_weights or {}
        self.loss_params = loss_params

        if not loss_modes:
            loss_modes = [LossModes.loc_2d]
        self.requested_loss_modes = [
            LossModes[m] if isinstance(m, str) else m for m in loss_modes]
        self.losses_to_calculate = resolve_loss_modes(self.requested_loss_modes)

        self.movements_optimizer = movements_optimizer or OptimizerSettings()
        self.trajectory_optimizer = trajectory_optimizer or OptimizerSettings()
        #: optimizer steps per epoch — the reference steps its LR schedulers
        #: once per EPOCH (Lightning interval='epoch'); optax schedules count
        #: optimizer steps, so epoch-granularity schedulers are scaled by
        #: this. The Trainer fills it in from the datamodule before
        #: init_state builds the optimizer; 1 = step-granularity fallback.
        self.steps_per_epoch = max(1, int(steps_per_epoch))
        self.transform = transform
        # AMP-style mixed precision (the Lightning ``--precision`` equivalent,
        # reference passes it through ``pl.Trainer.from_argparse_args``,
        # modeling.py:275-279): master params stay fp32; params and inputs are
        # cast to bf16 at model-apply time so the model matmuls hit the MXU at
        # full rate, and model outputs are cast back to fp32 before the
        # FK/projection/loss geometry (which must stay fp32 — see
        # ops/rotations.py).
        self.precision = "bf16" if str(precision) in ("16", "bf16") else "32"
        #: global-norm gradient clipping (the Lightning --gradient_clip_val
        #: Trainer flag); 0 = off
        self.gradient_clip_val = float(gradient_clip_val or 0.0)
        #: which fused-projection implementation flows with a ProjectionModule
        #: use ("xla" default; "pallas" = hand-written TPU kernel for
        #: forward-only paths — see ops/projection.py)
        self.projection_kernel = projection_kernel
        self.outputs_key = "projection_2d" if transform in (None, "none") \
            else "projection_2d_transformed"

        self.metrics = MetricCollection(self.get_metrics())
        self.initial_metrics = MetricCollection(
            {**self.get_metrics(), **self.get_initial_metrics()})

    # -- registry hooks ----------------------------------------------------
    @classmethod
    def get_available_models(cls) -> Dict[str, Dict[str, Any]]:
        return {}

    @classmethod
    def get_default_models(cls) -> Dict[str, Any]:
        return {}

    def get_metrics(self) -> Dict[str, Any]:
        return {}

    def get_initial_metrics(self) -> Dict[str, Any]:
        return {}

    def initial_preds(self, inputs, targets) -> Dict[str, Any]:
        """Baseline predictions for fit-start initial metrics (reference
        ``flow/base.py:258-298``: inputs-as-prediction)."""
        key = "projection_2d_deformed" \
            if targets.get("projection_2d_deformed") is not None \
            else "projection_2d"
        return {"projection_2d": targets.get(key),
                "projection_2d_transformed": inputs[..., :2]}

    def on_epoch_start(self, epoch: int) -> bool:
        """Per-epoch hook; return True if the jitted steps must be rebuilt
        (e.g. teacher-forcing ratio decay changed the traced model)."""
        import dataclasses

        model = self.movements_model
        drop = getattr(model, "teacher_force_drop", 0.0)
        ratio = getattr(model, "teacher_force_ratio", 0.0)
        if drop and ratio and epoch > 0 \
                and getattr(model, "teacher_mode", "no_force") != "no_force":
            new_ratio = max(0.0, ratio - drop)
            self.movements_model = dataclasses.replace(
                model, teacher_force_ratio=new_ratio)
            return True
        return False

    @property
    def needs_graph(self):
        return getattr(self.movements_model, "needs_graph", False)

    @property
    def needs_heatmaps(self):
        return getattr(self.movements_model, "needs_heatmaps", False)

    @property
    def needs_confidence(self):
        return getattr(self.movements_model, "needs_confidence", False)

    @property
    def crucial_keys(self) -> List[str]:
        return [self.outputs_key]

    # -- state -------------------------------------------------------------
    def init_state(self, key: jax.Array, sample_batch) -> FlowState:
        inputs, targets, meta = sample_batch
        k_mov, k_traj, k_drop = jax.random.split(key, 3)
        mov_vars = self.movements_model.init(
            {"params": k_mov, "dropout": k_drop}, inputs, training=False)
        traj_vars = self.trajectory_model.init({"params": k_traj}, inputs)

        params = {"movements": mov_vars.get("params", {}),
                  "trajectory": traj_vars.get("params", {})}
        mutables = {"movements": {k: v for k, v in mov_vars.items()
                                  if k != "params"},
                    "trajectory": {k: v for k, v in traj_vars.items()
                                   if k != "params"}}
        self._tx = self._make_optimizer()
        opt_state = self._tx.init(params)
        return FlowState(params=params, mutables=mutables,
                         opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    def current_lrs(self, state: "FlowState",
                    at_step: int = None) -> Dict[str, float]:
        """Effective per-model learning rates for step logging (the
        reference attaches Lightning's ``LearningRateMonitor``,
        ``modeling.py:240-247``). Schedule-based lrs are recomputed from the
        step counter; ReduceLROnPlateau's stateful scale is read out of the
        optimizer state.

        ``at_step`` recomputes the schedule-based lrs at a specific global
        step instead of ``state.step`` — the scan-folded trainer logs
        mid-chunk hits from chunk-end state, where per-step schedules
        (CosineAnnealingWarmRestarts, StepLR at epoch edges) would
        otherwise read up to K-1 steps ahead. The plateau scale still
        comes from ``state`` (it is stateful, not a step function; it
        moves once per epoch so it is constant within a chunk)."""
        def plateau_scale(tree, name=None):
            # prefer the per-model subtree (multi_transform keys its
            # inner_states dict by model name) so two plateau schedulers
            # don't read each other's scale
            if name is not None:
                sub = subtree_for(tree, name)
                if sub is not None:
                    found = plateau_scale(sub)
                    if found is not None:
                        return found
            if hasattr(tree, "scale") and hasattr(tree, "plateau_count"):
                return float(jax.device_get(tree.scale))
            for child in (tree if isinstance(tree, (tuple, list)) else
                          tree.values() if isinstance(tree, dict) else ()):
                found = plateau_scale(child)
                if found is not None:
                    return found
            return None

        def subtree_for(tree, name):
            if isinstance(tree, dict):
                if name in tree:
                    return tree[name]
                children = tree.values()
            elif isinstance(tree, (tuple, list)):
                children = tree
            else:
                return None
            for child in children:
                found = subtree_for(child, name)
                if found is not None:
                    return found
            return None

        step = (int(at_step) if at_step is not None
                else int(jax.device_get(state.step)))
        out = {}
        for name, settings in self.optimizer_settings_map().items():
            lr = settings.learning_rate
            if settings.enable_lr_scheduler:
                if settings.scheduler_type == "ReduceLROnPlateau":
                    scale = plateau_scale(state.opt_state, name)
                    if scale is not None:
                        lr *= scale
                elif settings.scheduler_type == "StepLR":
                    lr *= settings.scheduler_gamma ** (
                        step // max(1, settings.scheduler_step_size
                                    * self.steps_per_epoch))
                elif settings.scheduler_type == "CosineAnnealingWarmRestarts":
                    period = max(1, settings.scheduler_step_size) \
                        * self.steps_per_epoch
                    t = (step % period) / period
                    import math
                    lr = settings.scheduler_min_lr + 0.5 * (
                        lr - settings.scheduler_min_lr) * (
                        1 + math.cos(math.pi * t))
            out[f"lr-{name}"] = lr
        return out

    def optimizer_settings_map(self) -> Dict[str, OptimizerSettings]:
        """Per-model optimizer settings, keyed like ``state.params``."""
        return {"movements": self.movements_optimizer,
                "trajectory": self.trajectory_optimizer}

    def param_counts(self, state: "FlowState") -> Dict[str, int]:
        """Per-model parameter counts (the reference attaches Lightning's
        ``ModelSummary`` callback)."""
        return {name: int(sum(
            np.size(x) for x in jax.tree_util.tree_leaves(tree)))
            for name, tree in state.params.items()}

    def _make_optimizer(self) -> optax.GradientTransformationExtraArgs:
        # one optimizer over the joint param tree with per-model hyperparams
        # (the reference keeps two torch optimizers; a partitioned optax
        # transform is the idiomatic equivalent)
        tx_m = self.movements_optimizer.make(self.steps_per_epoch)
        tx_t = self.trajectory_optimizer.make(self.steps_per_epoch)

        def label(params):
            return {"movements": "movements", "trajectory": "trajectory"}
        tx = optax.multi_transform(
            {"movements": tx_m, "trajectory": tx_t}, label)
        if self.gradient_clip_val > 0:
            tx = optax.with_extra_args_support(optax.chain(
                optax.clip_by_global_norm(self.gradient_clip_val), tx))
        return tx

    # -- model application -------------------------------------------------
    @staticmethod
    def _cast_floats(tree, dtype):
        return jax.tree_util.tree_map(
            lambda x: x.astype(dtype)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, tree)

    def _apply_model(self, model, params, mutables, inputs, targets,
                     training: bool, rngs=None):
        half = self.precision == "bf16"
        if half:
            params = self._cast_floats(params, jnp.bfloat16)
            inputs = self._cast_floats(inputs, jnp.bfloat16)
            if targets is not None:
                targets = self._cast_floats(targets, jnp.bfloat16)
        variables = {"params": params, **mutables}
        mutable_keys = [k for k in mutables.keys() if mutables[k]]
        kwargs = {}
        if rngs:
            kwargs["rngs"] = rngs
        if training and mutable_keys:
            out, updated = model.apply(
                variables, inputs, targets, training=training,
                mutable=mutable_keys, **kwargs)
            if half:
                out = self._cast_floats(out, jnp.float32)
                # keep stored mutable collections (batch stats) in their
                # original dtypes so the jit carry shape is stable
                updated = jax.tree_util.tree_map(
                    lambda o, n: n.astype(o.dtype)
                    if hasattr(o, "dtype") else n, mutables, updated)
            return out, updated
        out = model.apply(variables, inputs, targets, training=training,
                          **kwargs)
        if half:
            out = self._cast_floats(out, jnp.float32)
        return out, mutables

    def _inner_step(self, params, mutables, batch, training: bool, rngs):
        """-> (sliced dict, new mutables). Flow-specific."""
        raise NotImplementedError

    # -- losses ------------------------------------------------------------
    def _compute_losses(self, sliced, targets) -> Dict[str, jnp.ndarray]:
        ctx = LossContext(
            input_nodes=self.movements_model.input_nodes,
            output_nodes=self.movements_model.output_nodes,
            sliced=sliced, targets=targets,
            loss_weights=self.loss_weights,
            loss_params=self.loss_params,
            mask_missing_joints=self.mask_missing_joints,
        )
        return calculate_losses(
            self.losses_to_calculate, self.requested_loss_modes, ctx)

    # -- pure steps (jitted by the trainer) --------------------------------
    def training_step(self, state: FlowState, batch, rng: jax.Array
                      ) -> Tuple[FlowState, Dict[str, jnp.ndarray]]:
        inputs, targets, meta = batch
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            sliced, new_mutables = self._inner_step(
                params, state.mutables, batch, training=True,
                rngs={"dropout": dropout_rng})
            loss_dict = self._compute_losses(sliced, sliced["targets"])
            name, primary = primary_loss(loss_dict, self.requested_loss_modes)
            return primary, (loss_dict, new_mutables)

        (primary, (loss_dict, new_mutables)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)

        updates, new_opt_state = self._tx.update(
            grads, state.opt_state, state.params, value=primary)
        new_params = optax.apply_updates(state.params, updates)

        logs = {f"train_loss/{k}": v for k, v in loss_dict.items()}
        logs["train_loss/primary"] = primary
        new_state = FlowState(params=new_params, mutables=new_mutables,
                              opt_state=new_opt_state, step=state.step + 1)
        return new_state, logs

    def eval_step(self, state: FlowState, batch
                  ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, Any], Dict[str, Any]]:
        """-> (loss dict, preds, targets) for metric accumulation."""
        sliced, _ = self._inner_step(
            state.params, state.mutables, batch, training=False, rngs=None)
        loss_dict = self._compute_losses(sliced, sliced["targets"])
        preds = self._metric_preds(sliced)
        return loss_dict, preds, sliced["targets"]

    def _metric_preds(self, sliced) -> Dict[str, Any]:
        """Preds dict for metrics (reference ``base.py:424-436``)."""
        preds = {
            "pose_changes": sliced.get("pose_inputs")
            if self.movements_model.output_type
            == MovementsModelOutputType.pose_changes else None,
            "world_loc_changes": None,
            "world_rot_changes": None,
        }
        for k in ("projection_2d", "projection_2d_transformed",
                  "absolute_pose_loc", "absolute_pose_rot",
                  "world_loc", "world_rot", "relative_pose_loc",
                  "relative_pose_rot"):
            if k in sliced:
                preds[k] = sliced[k]
        return preds
