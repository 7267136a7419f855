"""Device mesh + sharding helpers.

The reference's only parallelism is Lightning DDP over NCCL (reference
``modeling.py:275-279``; SURVEY §2.13). The TPU-native equivalent is a
``data`` x ``model`` :class:`jax.sharding.Mesh`: batches are sharded over
``data`` (gradient all-reduce inserted by XLA as ``psum`` over ICI) and the
large dense kernels are optionally tensor-sharded over ``model``. These
helpers are used identically by the Trainer (``training/trainer.py``) and the
driver dryrun (``__graft_entry__.py``) so the tested path is the shipped path.
"""
from dataclasses import dataclass
from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshConfig:
    """Mesh layout: ``data`` x ``model`` axes. ``data_axis_size=None`` uses
    all available devices for data parallelism."""
    data_axis_size: Optional[int] = None
    model_axis_size: int = 1

    def axis_sizes(self, num_devices: int):
        model = self.model_axis_size
        data = self.data_axis_size or (num_devices // model)
        return data, model


def make_mesh(config: MeshConfig = MeshConfig(),
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    data, model = config.axis_sizes(len(devices))
    mesh_devices = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(mesh_devices, ("data", "model"))


#: tensor-shard a kernel over ``model`` only when it is at least this big —
#: below it the all-gather costs more than the matmul saves
_TP_MIN_SIZE = 4096


def param_spec(x, model_axis_size: int) -> P:
    """Tensor-parallel layout rule for one param/opt-state leaf: shard the
    output (last) dim of large 2-D dense kernels over ``model``; replicate
    everything else (biases, norms, small kernels, scalars). The same
    shape-based rule applies to optimizer moments, which mirror the params."""
    if model_axis_size > 1 and getattr(x, "ndim", 0) == 2 \
            and x.shape[-1] % model_axis_size == 0 \
            and x.size >= _TP_MIN_SIZE:
        return P(None, "model")
    return P()


def state_shardings(mesh: Mesh, tree: Any) -> Any:
    """Per-leaf :class:`NamedSharding` pytree for a FlowState (params +
    optimizer state + mutables). Passed to ``jax.jit`` in/out_shardings so
    params *stay* sharded across steps instead of being re-gathered."""
    model = mesh.shape.get("model", 1)
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, param_spec(x, model)), tree)


def shard_state(mesh: Mesh, tree: Any) -> Any:
    """Place a FlowState on the mesh according to :func:`state_shardings`."""
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, state_shardings(mesh, tree))


def batch_spec(mesh: Mesh, x) -> P:
    """Batches shard their leading dim over ``data``; leaves that don't
    divide (scalars, odd-size meta) replicate."""
    if getattr(x, "ndim", 0) >= 1 and x.shape[0] % mesh.shape["data"] == 0:
        return P("data")
    return P()


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the leading (batch) dim sharded
    over the ``data`` axis. Scalars/1-dim-less leaves are replicated.

    Multi-host: each process holds only its slice of the global batch (the
    per-host input pipeline replacing the reference's DistributedSampler);
    the global array is assembled with
    :func:`jax.make_array_from_process_local_data`.
    """
    multihost = jax.process_count() > 1
    pi, pc = jax.process_index(), jax.process_count()

    def put(x):
        x = np.asarray(x) if not hasattr(x, "sharding") else x
        sharding = NamedSharding(mesh, batch_spec(mesh, x))
        if not multihost:
            return jax.device_put(x, sharding)
        if sharding.spec == P():  # replicated leaf: every host has it whole
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x))
        per_host = x.shape[0] // pc
        local = np.asarray(x[pi * per_host:(pi + 1) * per_host])
        return jax.make_array_from_process_local_data(sharding, local)

    return jax.tree_util.tree_map(put, batch)


def constrain_batch(mesh: Mesh, batch):
    """In-jit ``with_sharding_constraint`` pinning the batch layout so XLA
    cannot silently re-gather it mid-step."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, batch_spec(mesh, x)))
        if hasattr(x, "ndim") else x, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
