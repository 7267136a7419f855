"""Unit tests for the training-infrastructure pieces that were previously
covered only end-to-end: CheckpointManager (monitored-best semantics,
reference ``modeling.py:240-245``), scheme resolution (``utils/paths.py:
24-32``), and MetricsLogger rank-zero behavior."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.training.checkpoint import (
    CheckpointManager, resolve_ckpt_path)
from pedestrians_video_2_carla_tpu.training.loggers import MetricsLogger

STATE = {"w": jnp.arange(4.0), "b": jnp.ones(())}


def test_checkpoint_monitored_best_top1(tmp_path):
    cm = CheckpointManager(str(tmp_path), monitor="val_loss/primary",
                           mode="min")
    assert cm.maybe_save(STATE, {"val_loss/primary": 1.0}, step=1)
    first_best = cm.best_path
    # worse value: not saved
    assert not cm.maybe_save(STATE, {"val_loss/primary": 2.0}, step=2)
    # missing monitor key: not saved
    assert not cm.maybe_save(STATE, {"other": 0.0}, step=3)
    # better value: saved, and the previous best file is removed (top-1)
    assert cm.maybe_save(STATE, {"val_loss/primary": 0.5}, step=4)
    cm.wait()  # saves are async: join the writer before asserting on disk
    assert not os.path.exists(first_best + ".npz")
    assert os.path.exists(cm.best_path + ".npz")
    meta = json.loads((tmp_path / "best.json").read_text())
    assert meta["step"] == 4 and meta["val_loss/primary"] == 0.5


def test_checkpoint_restore_roundtrip_and_npz_suffix(tmp_path):
    cm = CheckpointManager(str(tmp_path))
    cm.maybe_save(STATE, {"val_loss/primary": 1.0}, step=7)
    # restore via best.json
    restored = cm.restore(STATE)
    np.testing.assert_allclose(np.asarray(restored["w"]),
                               np.asarray(STATE["w"]))
    # restore accepts both the stem and the on-disk .npz name
    stem = cm.save_last(STATE, step=8)
    for p in (stem, stem + ".npz"):
        r = cm.restore(STATE, path=p)
        np.testing.assert_allclose(np.asarray(r["b"]), 1.0)


def test_checkpoint_disabled_is_rank_zero_noop(tmp_path):
    target = tmp_path / "nonzero_rank"
    cm = CheckpointManager(str(target), enabled=False)
    assert not cm.maybe_save(STATE, {"val_loss/primary": 0.1}, step=1)
    cm.save_last(STATE, step=1)
    cm.wait()
    assert not target.exists()  # never even creates the directory


def test_checkpoint_async_semantics(tmp_path):
    """Async saves: the snapshot is taken at call time (later state mutation
    can't leak into an in-flight write), repeated save_last retires in order
    (last wins), no torn temp files remain, and async_save=False stays
    synchronous."""
    cm = CheckpointManager(str(tmp_path))
    state = {"w": jnp.zeros(4)}
    stem = cm.save_last(state, step=1)
    state["w"] = jnp.ones(4)  # mutate AFTER the save call
    cm.save_last(state, step=2)
    # restore() self-waits; both writes retired in order -> last wins
    r = cm.restore({"w": jnp.zeros(4)}, path=stem)
    np.testing.assert_allclose(np.asarray(r["w"]), 1.0)
    assert not [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]

    sync = CheckpointManager(str(tmp_path / "sync"), async_save=False)
    sync.save_last(STATE, step=1)
    # synchronous: on disk immediately, no wait() needed
    assert os.path.exists(str(tmp_path / "sync" / "last.npz"))


def test_checkpoint_async_write_errors_surface(tmp_path, monkeypatch):
    """A failed async write must (a) re-raise at wait() even if later
    submits retired the failed future first, and (b) leave the previous
    best checkpoint + best.json intact (new best is written before the old
    one is deleted)."""
    import pedestrians_video_2_carla_tpu.training.checkpoint as ckpt

    cm = CheckpointManager(str(tmp_path))
    assert cm.maybe_save(STATE, {"val_loss/primary": 1.0}, step=1)
    cm.wait()
    good_best = cm.best_path

    real_write = ckpt._write_leaves

    def failing_write(path, leaves):
        raise OSError("disk full (simulated)")

    monkeypatch.setattr(ckpt, "_write_leaves", failing_write)
    assert cm.maybe_save(STATE, {"val_loss/primary": 0.5}, step=2)
    import time
    for _ in range(100):  # let the failed future retire
        if all(f.done() for f in cm._pending):
            break
        time.sleep(0.02)
    monkeypatch.setattr(ckpt, "_write_leaves", real_write)
    cm.save_last(STATE, step=2)  # prunes the failed future — must not drop it
    with pytest.raises(OSError, match="disk full"):
        cm.wait()
    # previous best + its metadata survived the failed write
    assert os.path.exists(good_best + ".npz")
    meta = json.loads((tmp_path / "best.json").read_text())
    assert meta["path"] == good_best


def test_lr_schedulers_are_epoch_granular():
    """The reference steps LR schedulers once per EPOCH (Lightning
    interval='epoch'); with steps_per_epoch=S, StepLR(step_size=1) must decay
    after S optimizer steps, not after 1 (regression: per-step decay shrank
    lr by gamma^steps_per_epoch per epoch)."""
    import jax
    import optax

    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings

    s = OptimizerSettings(lr=1.0, enable_lr_scheduler=True,
                          scheduler_type="StepLR", scheduler_gamma=0.5,
                          scheduler_step_size=1)
    S = 10
    tx = s.make(steps_per_epoch=S)
    params = {"w": jnp.ones(3)}
    grads = {"w": jnp.ones(3)}
    opt_state = tx.init(params)
    deltas = []
    for _ in range(S + 1):
        updates, opt_state = tx.update(grads, opt_state, params, value=1.0)
        deltas.append(float(np.abs(np.asarray(updates["w"])).mean()))
    # ~constant within the first epoch (tiny Adam moment drift), halved on
    # crossing the epoch boundary
    np.testing.assert_allclose(deltas[:S], deltas[0], rtol=1e-4)
    np.testing.assert_allclose(deltas[S], deltas[0] * 0.5, rtol=1e-3)

    # the flow's logged lr matches the same epoch granularity
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes

    flow = PoseLiftingFlow(loss_modes=[LossModes.loc_2d],
                           movements_optimizer=s, steps_per_epoch=S)

    class FakeState:
        step = jnp.asarray(S - 1)
        opt_state = ()
    assert flow.current_lrs(FakeState())["lr-movements"] == 1.0
    FakeState.step = jnp.asarray(S)
    assert flow.current_lrs(FakeState())["lr-movements"] == 0.5


def test_resolve_ckpt_path_schemes(tmp_path):
    run_dir = tmp_path / "logs" / "flow" / "shiny-run" / "checkpoints"
    run_dir.mkdir(parents=True)
    cm = CheckpointManager(str(run_dir))
    cm.save_last(STATE, step=1)
    cm.maybe_save(STATE, {"val_loss/primary": 1.0}, step=2)
    cm.wait()

    assert resolve_ckpt_path("plain/path") == "plain/path"
    assert resolve_ckpt_path("file:///x/y.npz") == "/x/y.npz"
    # wandb://entity/project/run degrades to the local artifact lookup,
    # preferring the monitored-best over 'last'
    hit = resolve_ckpt_path("wandb://ent/proj/shiny-run:v3",
                            search_root=str(tmp_path))
    assert os.path.basename(hit).startswith("best-step")
    with pytest.raises(FileNotFoundError):
        resolve_ckpt_path("wandb://ent/proj/nope", search_root=str(tmp_path))


def test_metrics_logger_jsonl_and_rank_zero(tmp_path):
    logger = MetricsLogger(str(tmp_path / "run"))
    logger.log_scalars(1, {"train_loss/primary": 0.5})
    logger.log_hparams({"batch_size": 4})
    logger.log_hparams({"extra": "x"})  # merges, not overwrites
    logger.close()
    lines = [json.loads(l) for l in
             (tmp_path / "run" / "metrics.jsonl").read_text().splitlines()]
    assert lines[0]["train_loss/primary"] == 0.5 and lines[0]["step"] == 1
    hp = json.loads((tmp_path / "run" / "hparams.json").read_text())
    assert hp == {"batch_size": 4, "extra": "x"}

    silent = MetricsLogger(str(tmp_path / "rank1"), enabled=False)
    silent.log_scalars(1, {"a": 1.0})
    silent.log_hparams({"a": 1})
    silent.close()
    assert not (tmp_path / "rank1").exists()


def test_wandb_replay_roundtrip(tmp_path, monkeypatch):
    """WandbOfflineLogger run dirs replay losslessly through
    tools/wandb_replay.py (the ``wandb sync`` gap documented at
    ``training/loggers.py``; reference's primary logger is WandbLogger,
    ``modeling.py:194-224``)."""
    import sys
    import types

    from pedestrians_video_2_carla_tpu.training.loggers import (
        WandbOfflineLogger)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    try:
        import wandb_replay
    finally:
        sys.path.pop(0)

    logger = WandbOfflineLogger(str(tmp_path / "logs"), run_id="rt",
                                project="proj", entity="ent",
                                argv=["prog", "--flag"])
    logger.log_hparams({"batch_size": 16, "lr": 1e-3})
    logger.log_scalars(1, {"train_loss/primary": 0.5, "skipme": "str"})
    logger.log_scalars(2, {"train_loss/primary": 0.25})
    logger.close()

    run_dirs = wandb_replay.discover_run_dirs(str(tmp_path / "logs"))
    assert len(run_dirs) == 1

    # dry-run: parse + validate without wandb installed
    stats = wandb_replay.replay_run(run_dirs[0], dry_run=True)
    assert stats == {"rows": 2, "config_keys": 2, "summary_keys": 3}

    # full replay against a stub wandb module: history rows, steps,
    # config, and summary must round-trip exactly
    logged = []
    summary = {}

    class _Run:
        def __init__(self):
            self.summary = summary
        def log(self, row, step=None):
            logged.append((step, row))
        def finish(self):
            pass

    stub = types.ModuleType("wandb")
    inits = []
    stub.init = lambda **kw: (inits.append(kw), _Run())[1]
    stub.Settings = lambda **kw: kw
    monkeypatch.setitem(sys.modules, "wandb", stub)

    wandb_replay.replay_run(run_dirs[0])
    assert inits[0]["entity"] == "ent" and inits[0]["project"] == "proj"
    assert inits[0]["config"] == {"batch_size": 16, "lr": 1e-3}
    assert [s for s, _ in logged] == [1, 2]
    assert logged[0][1]["train_loss/primary"] == 0.5
    assert logged[1][1]["train_loss/primary"] == 0.25
    assert summary["train_loss/primary"] == 0.25

    # malformed history surfaces as ValueError naming the line
    files = run_dirs[0]
    with open(os.path.join(files, "wandb-history.jsonl"), "a") as f:
        f.write('{"no_step": 1}\n')
    with pytest.raises(ValueError, match="missing _step"):
        wandb_replay.load_run(files)
