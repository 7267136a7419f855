"""Real multi-HOST test: 2 processes x 4 virtual CPU devices each, glued by
``jax.distributed`` + Gloo collectives, running the trainer-style sharded
training step with per-process batch slices. Verifies the
``shard_batch``/``make_array_from_process_local_data`` multihost branch and
cross-host gradient psum produce exactly the single-process result.

The reference's DDP (``modeling.py:275-279``) had no test coverage at all
(SURVEY §4: "Multi-node/distributed testing: none").
"""
import json
import os
import socket
import subprocess
import sys

import jax
import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _single_process_reference():
    """Same config as multihost_worker.py on this process's own 8-device
    mesh (4 data x 2 model) — the ground truth the 2-host run must match."""
    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import (
        PoseLiftingFlow)
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS
    from pedestrians_video_2_carla_tpu.parallel.mesh import (
        MeshConfig, constrain_batch, make_mesh, shard_batch, shard_state,
        state_shardings)

    mesh = make_mesh(MeshConfig(data_axis_size=4, model_axis_size=2))
    cfg = Carla2D3DConfig(batch_size=16, clip_length=4)
    batch = jax.tree_util.tree_map(
        np.asarray, generate_batch(jax.random.PRNGKey(0), cfg))
    flow = PoseLiftingFlow(
        movements_model=MOVEMENTS_MODELS["LinearAE"](),
        loss_modes=[LossModes.loc_2d],
        movements_optimizer=OptimizerSettings(lr=1e-3))
    state = flow.init_state(jax.random.PRNGKey(1), batch)
    with mesh:
        shardings = state_shardings(mesh, state)
        state = shard_state(mesh, state)
        step = jax.jit(
            lambda s, b, rng: flow.training_step(
                s, constrain_batch(mesh, b), rng),
            in_shardings=(shardings, None, None),
            out_shardings=(shardings, None))
        losses = []
        for i in range(3):
            state, logs = step(state, shard_batch(mesh, batch),
                               jax.random.PRNGKey(2 + i))
            losses.append(float(logs["train_loss/primary"]))
        norm = float(jax.tree_util.tree_reduce(
            lambda acc, x: acc + float((np.asarray(x, np.float32) ** 2).sum()),
            jax.device_get(state.params), 0.0) ** 0.5)
    return losses, norm


@pytest.mark.slow
def test_two_host_training_matches_single_process(tmp_path):
    port = _free_port()
    out_path = tmp_path / "host0.json"
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = os.pathsep.join(
        [repo_root] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else []))
    # 4 virtual devices per host (the parent test process keeps its own 8)
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if "xla_force_host_platform_device_count" not in f]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=4"])

    procs = [subprocess.Popen(
        [sys.executable, worker, str(i), "2", str(port), str(out_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for p, out in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"

    with open(out_path) as f:
        result = json.load(f)
    assert result["process_count"] == 2
    assert result["global_devices"] == 8

    ref_losses, ref_norm = _single_process_reference()
    np.testing.assert_allclose(result["losses"], ref_losses,
                               rtol=1e-5, atol=1e-7)
    assert result["param_norm"] == pytest.approx(ref_norm, rel=1e-5)
