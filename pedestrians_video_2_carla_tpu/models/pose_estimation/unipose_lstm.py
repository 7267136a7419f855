"""UniPoseLSTM (Artacho & Savakis, CVPR'20 UniPose + LSTM) — video frames ->
per-joint heatmaps with temporal recurrence.

Reference wrapper: ``modules/pose_estimation/unipose/unipose_lstm.py:10-96``
(+ ``overrides.py`` monkey-patching the vendored submodule). TPU-native
re-design: NHWC flax ResNet backbone with output-stride dilation, WASP
(waterfall atrous spatial pooling) module, low-level-feature decoder, and a
convolutional LSTM over the frame axis expressed as ``nn.scan`` (the reference
loops frames in Python, threading hidden/cell through the vendored model).
The constant center-gaussian map the reference concatenates per frame is baked
in the same way.
"""
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...flows.output_types import PoseEstimationModelOutputType
from ...ops.heatmaps import gaussian_heatmaps
from ..backbones.resnet import resnet50, resnet101
from .linear import PoseEstimationModel


class _AtrousBranch(nn.Module):
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = nn.Conv(self.features, (3, 3),
                    kernel_dilation=(self.dilation,) * 2,
                    padding=[(self.dilation,) * 2] * 2, use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not training)(y)
        return nn.relu(y)


class WASP(nn.Module):
    """Waterfall atrous pooling: cascaded dilated branches, each also
    contributing a 1x1-projected output, plus global pooling."""
    features: int = 256
    dilations: Sequence[int] = (6, 12, 18, 24)

    @nn.compact
    def __call__(self, x, training: bool = False):
        outs = []
        h = x
        for d in self.dilations:
            h = _AtrousBranch(self.features, d)(h, training)
            outs.append(nn.Conv(self.features, (1, 1))(h))
        gp = jnp.mean(x, axis=(1, 2), keepdims=True)
        gp = nn.relu(nn.Conv(self.features, (1, 1))(gp))
        gp = jnp.broadcast_to(gp, outs[0].shape[:3] + (self.features,))
        y = jnp.concatenate(outs + [gp], axis=-1)
        y = nn.Conv(self.features, (1, 1), use_bias=False)(y)
        y = nn.BatchNorm(use_running_average=not training)(y)
        return nn.relu(y)


class Decoder(nn.Module):
    """Fuse WASP features with low-level backbone features -> heatmaps."""
    num_classes: int
    features: int = 256

    @nn.compact
    def __call__(self, x, low_level, training: bool = False):
        low = nn.Conv(48, (1, 1), use_bias=False)(low_level)
        low = nn.BatchNorm(use_running_average=not training)(low)
        low = nn.relu(low)
        x = jax.image.resize(x, low.shape[:3] + (x.shape[-1],), "bilinear")
        y = jnp.concatenate([x, low], axis=-1)
        for _ in range(2):
            y = nn.Conv(self.features, (3, 3), padding="SAME",
                        use_bias=False)(y)
            y = nn.BatchNorm(use_running_average=not training)(y)
            y = nn.relu(y)
        return nn.Conv(self.num_classes, (1, 1))(y)


class _ConvLSTMStep(nn.Module):
    """Convolutional LSTM cell over heatmap features (UniPose-LSTM's temporal
    module), scanned over the frame axis."""
    features: int

    @nn.compact
    def __call__(self, carry, x_t):
        h, c = carry
        z = jnp.concatenate([x_t, h], axis=-1)
        gates = nn.Conv(4 * self.features, (3, 3), padding="SAME")(z)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h_new = nn.sigmoid(o) * jnp.tanh(c_new)
        return (h_new, c_new), h_new


class UniPoseLSTM(PoseEstimationModel):
    stride: int = 8
    output_stride: int = 16
    backbone: str = "resnet101"
    sigma: float = 3.0
    lstm_features: int = 64
    needs_heatmaps = True

    @property
    def output_type(self) -> PoseEstimationModelOutputType:
        return PoseEstimationModelOutputType.heatmaps

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        """x: (B, L, H, W, 3) video frames (NHWC)
        -> (B, L, J+1, H/stride, W/stride) heatmaps incl. background."""
        B, L, H, W, C = x.shape
        num_classes = len(self.output_nodes) + 1  # + background channel

        # constant center gaussian, as in the reference forward
        centermap = gaussian_heatmaps(
            jnp.asarray([[W / 2.0, H / 2.0]]), (W, H), self.sigma,
            add_background=False)[0][..., None]  # (H, W, 1)
        centermap = jnp.broadcast_to(centermap, (B, L, H, W, 1))
        h = jnp.concatenate([x, centermap], axis=-1)

        frames = h.reshape(B * L, H, W, C + 1)
        bb = {"resnet50": resnet50, "resnet101": resnet101}[self.backbone](
            output_stride=self.output_stride)
        high, low = bb(frames, training)
        y = WASP()(high, training)
        maps = Decoder(self.lstm_features)(y, low, training)
        # decoder outputs land at 1/4; pool to the configured stride
        hh, ww = H // self.stride, W // self.stride
        maps = jax.image.resize(maps, (B * L, hh, ww, self.lstm_features),
                                "bilinear")
        maps = maps.reshape(B, L, hh, ww, self.lstm_features)

        # temporal ConvLSTM over frames
        scan = nn.scan(_ConvLSTMStep, variable_broadcast="params",
                       split_rngs={"params": False}, in_axes=1, out_axes=1)
        zeros = jnp.zeros((B, hh, ww, self.lstm_features), maps.dtype)
        _, smoothed = scan(self.lstm_features, name="conv_lstm")(
            (zeros, zeros), maps)

        heatmaps = nn.Conv(num_classes, (1, 1), name="head")(smoothed)
        # -> (B, L, J+1, h, w) channel-first like the reference heatmaps
        return jnp.transpose(heatmaps, (0, 1, 4, 2, 3))

    @staticmethod
    def supported_output_types():
        return [PoseEstimationModelOutputType.heatmaps]
