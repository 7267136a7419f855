"""ResNet-50/101 in flax (NHWC, bottleneck blocks) with optional output-stride
dilation (DeepLab-style, as UniPose's backbone uses) and a torchvision
state_dict importer for pretrained-weight injection (the reference injects
torchvision weights into its UniPose backbone,
``modules/pose_estimation/unipose/unipose_lstm.py:33-46``)."""
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import numpy as np


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    dilation: int = 1
    expansion: int = 4

    @nn.compact
    def __call__(self, x, training: bool = False):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not training, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=(self.strides,) * 2,
                    kernel_dilation=(self.dilation,) * 2,
                    padding=[(self.dilation,) * 2] * 2,
                    use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not training, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * self.expansion, (1, 1), use_bias=False,
                    name="conv3")(y)
        y = nn.BatchNorm(use_running_average=not training, name="bn3")(y)

        if residual.shape[-1] != self.features * self.expansion \
                or self.strides != 1:
            residual = nn.Conv(self.features * self.expansion, (1, 1),
                               strides=(self.strides,) * 2, use_bias=False,
                               name="downsample_conv")(x)
            residual = nn.BatchNorm(use_running_average=not training,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """Returns (high-level features, low-level features) like DeepLab
    backbones; low-level = after layer1 (for the UniPose decoder)."""
    stage_sizes: Sequence[int] = (3, 4, 6, 3)
    output_stride: Optional[int] = None  # None = standard 32

    @nn.compact
    def __call__(self, x, training: bool = False):
        strides = [1, 2, 2, 2]
        dilations = [1, 1, 1, 1]
        if self.output_stride == 16:
            strides, dilations = [1, 2, 2, 1], [1, 1, 1, 2]
        elif self.output_stride == 8:
            strides, dilations = [1, 2, 1, 1], [1, 1, 2, 4]

        y = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                    use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not training, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        low_level = None
        for stage, blocks in enumerate(self.stage_sizes):
            features = 64 * (2 ** stage)
            for block in range(blocks):
                y = Bottleneck(
                    features,
                    strides=strides[stage] if block == 0 else 1,
                    dilation=dilations[stage],
                    name=f"layer{stage + 1}_{block}")(y, training)
            if stage == 0:
                low_level = y
        return y, low_level


def resnet50(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 6, 3), **kwargs)


def resnet101(**kwargs) -> ResNet:
    return ResNet(stage_sizes=(3, 4, 23, 3), **kwargs)


def import_torchvision_resnet(state_dict: Dict[str, np.ndarray],
                              stage_sizes: Sequence[int] = (3, 4, 6, 3)
                              ) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """torchvision resnet state_dict (numpy values) -> (params, batch_stats).
    Conv (out,in,kh,kw) -> (kh,kw,in,out)."""
    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}

    def conv(name):
        return {"kernel": np.transpose(state_dict[f"{name}.weight"],
                                       (2, 3, 1, 0)).copy()}

    def bn(name):
        return ({"scale": state_dict[f"{name}.weight"].copy(),
                 "bias": state_dict[f"{name}.bias"].copy()},
                {"mean": state_dict[f"{name}.running_mean"].copy(),
                 "var": state_dict[f"{name}.running_var"].copy()})

    params["conv1"] = conv("conv1")
    params["bn1"], stats["bn1"] = bn("bn1")
    for stage, blocks in enumerate(stage_sizes):
        for block in range(blocks):
            t = f"layer{stage + 1}.{block}"
            f = f"layer{stage + 1}_{block}"
            bp: Dict[str, Any] = {}
            bs: Dict[str, Any] = {}
            for i in (1, 2, 3):
                bp[f"conv{i}"] = conv(f"{t}.conv{i}")
                bp[f"bn{i}"], bs[f"bn{i}"] = bn(f"{t}.bn{i}")
            if f"{t}.downsample.0.weight" in state_dict:
                bp["downsample_conv"] = conv(f"{t}.downsample.0")
                bp["downsample_bn"], bs["downsample_bn"] = \
                    bn(f"{t}.downsample.1")
            params[f] = bp
            stats[f] = bs
    return params, stats
