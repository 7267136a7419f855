"""Trajectory model base + Zero implementation (reference
``modules/trajectory/trajectory.py:5-19``, ``modules/trajectory/zero.py:5-20``)."""
from typing import Type

import flax.linen as nn
import jax.numpy as jnp

from ...flows.output_types import TrajectoryModelOutputType
from ...skeletons.base import Skeleton
from ...skeletons.carla import CARLA_SKELETON


class TrajectoryModel(nn.Module):
    input_nodes: Type[Skeleton] = CARLA_SKELETON
    needs_targets = False

    @property
    def output_type(self) -> TrajectoryModelOutputType:
        return TrajectoryModelOutputType.changes


class ZeroTrajectory(TrajectoryModel):
    """No in-world movement: zero location changes + identity rotations.

    ``is_zero`` lets flows skip the world-track accumulation entirely
    (identity transforms) instead of scanning over literal zeros."""
    is_zero = True

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        _ = self.param("dummy", nn.initializers.zeros, (1,))
        B, L = x.shape[:2]
        world_loc = jnp.zeros((B, L, 3), dtype=x.dtype)
        world_rot = jnp.broadcast_to(jnp.eye(3, dtype=x.dtype), (B, L, 3, 3))
        return world_loc, world_rot
