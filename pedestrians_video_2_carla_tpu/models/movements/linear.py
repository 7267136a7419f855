"""Single-linear debug model (reference ``modules/movements/linear.py:6-57``)."""
import flax.linen as nn

from .common import MovementsModel


class Linear(MovementsModel):
    """One Dense layer over the flattened per-frame joints."""
    needs_confidence: bool = False

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        h = x.reshape(B, L, -1)
        out = nn.Dense(out_joints * self.output_features)(h)
        return self.format_output(
            out.reshape(B, L, out_joints, self.output_features))
