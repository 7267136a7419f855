"""Identity/debug movements model (reference ``modules/movements/zero.py:6-52``)."""
import flax.linen as nn
import jax.numpy as jnp

from ...flows.output_types import MovementsModelOutputType
from .common import MovementsModel


class ZeroMovements(MovementsModel):
    """Outputs identity pose changes (or passes 2D input through) — used to
    debug the flow plumbing end to end."""

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        # a throwaway parameter so the optimizer has something to hold
        _ = self.param("dummy", nn.initializers.zeros, (1,))
        if self.movements_output_type == MovementsModelOutputType.pose_changes:
            B, L = x.shape[:2]
            return jnp.broadcast_to(
                jnp.eye(3, dtype=x.dtype),
                (B, L, len(self.output_nodes), 3, 3))
        if self.movements_output_type == MovementsModelOutputType.pose_2d:
            return x[..., :2]
        raise ValueError(
            f"Unsupported movements output type: {self.movements_output_type}")

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.pose_changes,
                MovementsModelOutputType.pose_2d]
