"""Multi-device scaling tests over the 8-virtual-device CPU mesh — something
the reference never had (its DDP was exercised only in real runs; SURVEY §4)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.parallel.mesh import (MeshConfig, make_mesh,
                                                         replicate,
                                                         shard_batch)


def test_mesh_has_eight_devices():
    mesh = make_mesh(MeshConfig())
    assert mesh.shape["data"] * mesh.shape["model"] == 8


def test_shard_batch_partitions_leading_dim():
    mesh = make_mesh(MeshConfig())
    batch = {"x": np.arange(16 * 3, dtype=np.float32).reshape(16, 3),
             "scalar": np.float32(1.0)}
    sharded = shard_batch(mesh, batch)
    x = sharded["x"]
    assert x.shape == (16, 3)
    # leading dim split over the data axis
    assert len(x.sharding.device_set) == mesh.shape["data"]
    np.testing.assert_array_equal(np.asarray(x), batch["x"])


def test_training_step_on_mesh_matches_single_device(rng):
    """The data-parallel training step must produce the same loss and
    parameter update as the unsharded one (XLA inserts the psum)."""
    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS

    cfg = Carla2D3DConfig(batch_size=16, clip_length=4)
    batch = generate_batch(jax.random.PRNGKey(0), cfg)
    batch = jax.tree_util.tree_map(np.asarray, batch)

    def run(sharded: bool):
        flow = PoseLiftingFlow(
            movements_model=MOVEMENTS_MODELS["Linear"](),
            loss_modes=[LossModes.loc_2d],
            movements_optimizer=OptimizerSettings(lr=1e-3))
        state = flow.init_state(jax.random.PRNGKey(1), batch)
        step = jax.jit(flow.training_step, donate_argnums=(0,))
        if sharded:
            mesh = make_mesh(MeshConfig())
            with mesh:
                state = replicate(mesh, state)
                b = shard_batch(mesh, batch)
                state, logs = step(state, b, jax.random.PRNGKey(2))
        else:
            state, logs = step(state, batch, jax.random.PRNGKey(2))
        return float(logs["train_loss/primary"]), state.params

    loss_sharded, params_sharded = run(True)
    loss_single, params_single = run(False)
    assert loss_sharded == pytest.approx(loss_single, rel=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(params_sharded),
                    jax.tree_util.tree_leaves(params_single)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_metric_states_reduce_across_shards():
    """Per-shard metric accumulators sum to the global value (the moral
    equivalent of torchmetrics' dist_sync_on_step)."""
    from pedestrians_video_2_carla_tpu.metrics.base import MetricCollection
    from pedestrians_video_2_carla_tpu.metrics.pose import MPJPE

    m = MetricCollection({"MPJPE": MPJPE()})
    gt = jnp.zeros((8, 3, 26, 3))
    pred = gt + 0.002
    # global
    global_state = m.update(m.init_state(),
                            {"absolute_pose_loc": pred},
                            {"absolute_pose_loc": gt})
    # four shards of 2 clips
    shard_states = []
    for i in range(4):
        s = m.update(m.init_state(),
                     {"absolute_pose_loc": pred[2 * i:2 * i + 2]},
                     {"absolute_pose_loc": gt[2 * i:2 * i + 2]})
        shard_states.append(s)
    merged = m.tree_sum(shard_states)
    np.testing.assert_allclose(
        float(m.compute(merged)["MPJPE"]),
        float(m.compute(global_state)["MPJPE"]), rtol=1e-6)


def test_graft_dryrun_multichip():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as graft
    graft.dryrun_multichip(8)
