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
from .common import MovementsModel


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
            # temporal conv over axis 1, VALID padding
            return nn.Conv(features, kernel_size=(width,),
                           kernel_dilation=(dilation,), padding="VALID",
                           use_bias=False, name=name)(v)

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
            y = bn_relu_drop(nn.Conv(self.channels, kernel_size=(1,),
                                     use_bias=False,
                                     name=f"layer{i}_conv2")(y))
            h = res + y
            dilation *= width

        out = nn.Dense(out_joints * 3, name="shrink")(h)
        return out.reshape(B, L, out_joints, 3)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.absolute_loc]
