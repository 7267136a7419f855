"""Device mesh + sharding helpers."""
from dataclasses import dataclass
from typing import Optional, Sequence

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


def shard_batch(mesh: Mesh, batch):
    """Device-put a host batch pytree with the leading (batch) dim sharded
    over the ``data`` axis. Scalars/1-dim-less leaves are replicated."""
    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    def put(x):
        x = np.asarray(x) if not hasattr(x, "sharding") else x
        if getattr(x, "ndim", 0) >= 1 \
                and x.shape[0] % mesh.shape["data"] == 0:
            return jax.device_put(x, data_sharding)
        return jax.device_put(x, replicated)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
