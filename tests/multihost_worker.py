"""Worker process for the real multi-host test (``test_multihost.py``).

Each worker is one *host* of a 2-host x 4-virtual-CPU-device cluster glued
together with ``jax.distributed`` + Gloo CPU collectives — the closest
no-hardware stand-in for a multi-host TPU pod slice (hosts on DCN, chips on
ICI). It runs the same trainer-style sharded training step the single-process
mesh tests cover, but with the batch assembled from *per-process local
slices* via ``jax.make_array_from_process_local_data``
(``parallel/mesh.py::shard_batch`` multihost branch) and the gradient psum
crossing the host boundary.

The reference's equivalent surface is Lightning DDP over NCCL
(``modeling.py:275-279``; SURVEY §2.13), which its test suite never
exercised.

Invoked as:
    python multihost_worker.py <process_id> <num_processes> <port> <out.json>
"""
import json
import sys

import jax

jax.config.update("jax_platforms", "cpu")


def main(pid: int, nproc: int, port: str, out_path: str) -> None:
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc
    assert jax.device_count() == nproc * jax.local_device_count()

    import numpy as np

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

    # data axis spans the two hosts (grad all-reduce over "DCN"), model axis
    # stays within a host — the layout a real pod slice would use
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

        def step_fn(s, b, rng):
            return flow.training_step(s, constrain_batch(mesh, b), rng)

        step = jax.jit(step_fn, in_shardings=(shardings, None, None),
                       out_shardings=(shardings, None))

        losses = []
        for i in range(3):
            b = shard_batch(mesh, batch)  # multihost branch: local slices
            state, logs = step(state, b, jax.random.PRNGKey(2 + i))
            losses.append(float(logs["train_loss/primary"]))

        # replicated global param L2 norm — fetchable from any host even
        # though model-sharded leaves are only partially addressable
        norm = jax.jit(
            lambda s: jax.tree_util.tree_reduce(
                lambda acc, x: acc + (x.astype("float32") ** 2).sum(),
                s.params, 0.0) ** 0.5,
            out_shardings=jax.sharding.NamedSharding(
                mesh, jax.sharding.PartitionSpec()))(state)
        result = {"process_index": pid,
                  "process_count": jax.process_count(),
                  "global_devices": jax.device_count(),
                  "losses": losses,
                  "param_norm": float(norm)}

    if pid == 0:
        with open(out_path, "w") as f:
            json.dump(result, f)
    print(f"[worker {pid}] OK {result}", flush=True)


if __name__ == "__main__":
    main(int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], sys.argv[4])
