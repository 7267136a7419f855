"""Linear autoencoder family (reference ``modules/movements/linear_ae/``):

* ``LinearAE``     — 3-layer MLP encoder/decoder, per-frame (``linear_ae.py:5-59``)
* ``LinearAE2D``   — scaled 2D->2D AE for the autoencoder flow (``linear_ae_2d.py``)
* ``LinearAEResidual[Leaky]`` — residual-bottleneck AE with BatchNorm+Dropout,
  absolute_loc_rot output (``linear_ae_residual.py:9-111``)
"""
from typing import Callable

import flax.linen as nn

from ...flows.output_types import MovementsModelOutputType
from ...ops.rotations import rotation_6d_to_matrix
from .common import MovementsModel, TorchDense, identity_head_dense


class LinearAE(MovementsModel):
    """Per-frame MLP autoencoder: sizes /2, /4, /8 of the input.

    Uses torch-default layer init (``TorchDense``): with flax's zero-bias
    lecun init this model plateaus in a ~430-540 mm MPJPE basin on the
    flagship fp32 config; torch init reaches the reference's ~200 mm basin
    (quality-parity study, ``docs/quality_parity.json``). With
    ``identity_head`` (default) the final layer starts at the identity
    rotation neighborhood — training begins from the reference pose, which
    removes the bad-basin init lottery both frameworks otherwise share
    (~1-in-3 seeds settle at ~500 mm). Layers keep the ``Dense_i`` names
    for checkpoint/torch-import compatibility."""
    identity_head: bool = True

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        in_size = len(self.input_nodes) * 2
        out_size = out_joints * self.output_features
        h = x[..., :2].reshape(B * L, in_size)
        widths = (in_size // 2, in_size // 4, in_size // 8,
                  out_size // 4, out_size // 2)
        for i, width in enumerate(widths):
            h = nn.relu(TorchDense(width, name=f"Dense_{i}")(h))
        head = identity_head_dense(
            out_size, self.movements_output_type, out_joints,
            name=f"Dense_{len(widths)}") if self.identity_head \
            else TorchDense(out_size, name=f"Dense_{len(widths)}")
        out = head(h)
        return self.format_output(
            out.reshape(B, L, out_joints, self.output_features))


class LinearAE2D(MovementsModel):
    """Frame-independent 2D->2D autoencoder with a width scaling factor.
    torch-default layer init (see :class:`LinearAE`)."""
    model_scaling_factor: int = 8
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.pose_2d

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        s = self.model_scaling_factor
        h = x[..., :2].reshape(B * L, -1)
        i = 0
        for width in (1024 // s, 512 // s, 256 // s):
            h = nn.relu(TorchDense(width, name=f"Dense_{i}")(h))
            i += 1
        h = TorchDense(128 // s, name=f"Dense_{i}")(h)
        i += 1
        for width in (256 // s, 512 // s, 1024 // s):
            h = nn.relu(TorchDense(width, name=f"Dense_{i}")(h))
            i += 1
        out = TorchDense(out_joints * 2, name=f"Dense_{i}")(h)
        return out.reshape(B, L, out_joints, 2)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.pose_2d]


class LinearAEResidual(MovementsModel):
    """Residual bottleneck AE; always outputs absolute (loc, rot)."""
    linear_size: int = 256
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.absolute_loc_rot
    activation: Callable = nn.relu

    def _block(self, h, width, training):
        h = nn.Dense(width, kernel_init=nn.initializers.kaiming_normal())(h)
        h = nn.BatchNorm(use_running_average=not training)(h)
        h = self.activation(h)
        return nn.Dropout(0.5, deterministic=not training)(h)

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        ls = self.linear_size
        flat = x[..., :2].reshape(B * L, -1)

        h = nn.Dense(ls, kernel_init=nn.initializers.kaiming_normal())(flat)
        for width in (ls // 2, ls // 4, ls // 8):
            h = self._block(h, width, training)

        res = nn.Dense(ls // 8,
                       kernel_init=nn.initializers.kaiming_normal())(flat)
        res = nn.BatchNorm(use_running_average=not training)(res)
        bottleneck = h + self.activation(res)

        h = bottleneck
        for width in (ls // 4, ls // 2):
            h = self._block(h, width, training)
        h = nn.Dense(ls, kernel_init=nn.initializers.kaiming_normal())(h)
        out = nn.Dense(out_joints * 9,
                       kernel_init=nn.initializers.kaiming_normal())(h)
        out = out.reshape(B, L, out_joints, 9)
        return out[..., :3], rotation_6d_to_matrix(out[..., 3:])

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.absolute_loc_rot]


class LinearAEResidualLeaky(LinearAEResidual):
    """Leaky-ReLU variant (reference registers it as a separate model)."""
    activation: Callable = nn.leaky_relu
