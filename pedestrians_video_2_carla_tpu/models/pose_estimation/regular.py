"""Video-frame pose regressors: P0 (ResNet + cascaded atrous convs) and
AvPedestrianPoseTransformer (ResNet + transformer encoder over frames).

Reference ``modules/pose_estimation/regular/p0.py:36-112`` and
``transformers/avpedestrian_pose_transformer.py:36-116``. Both pool ResNet-50
features per frame and regress (J, 2); NHWC flax with the frame axis folded
into the batch for the backbone."""
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..backbones.resnet import resnet50
from ..movements.transformers import _EncoderLayer
from .linear import PoseEstimationModel


class _AtrousModule(nn.Module):
    features: int
    dilation: int

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = nn.Conv(self.features, (1, 1),
                    kernel_dilation=(self.dilation,) * 2,
                    use_bias=False)(x)
        y = nn.BatchNorm(use_running_average=not training)(y)
        return nn.relu(y)


class P0(PoseEstimationModel):
    """ResNet-50 (pooled) -> cascaded atrous modules -> Dense -> (J, 2)."""
    dilations: Sequence[int] = (24, 18, 12, 6)

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        frames = x.reshape(B * L, *x.shape[2:])
        high, _ = resnet50()(frames, training)
        h = jnp.mean(high, axis=(1, 2), keepdims=True)  # global avg pool
        for i, d in enumerate(self.dilations):
            h = _AtrousModule(256, d)(h, training)
        h = h.reshape(B, L, -1)
        h = nn.Dense(out_joints * 2, name="linear_second")(h)
        h = nn.Dropout(0.5, deterministic=not training)(h)
        h = nn.relu(h)
        return h.reshape(B, L, out_joints, 2)


class AvPedestrianPoseTransformer(PoseEstimationModel):
    """ResNet-50 (pooled) -> 2 Dense -> 6-layer transformer over frames ->
    Dense -> (J, 2)."""
    num_layers: int = 6
    n_heads: int = 4

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        d_model = out_joints * 2
        frames = x.reshape(B * L, *x.shape[2:])
        high, _ = resnet50()(frames, training)
        h = jnp.mean(high, axis=(1, 2)).reshape(B, L, -1)

        h = nn.Dense(256, name="linear_first")(h)
        h = nn.relu(nn.Dropout(0.5, deterministic=not training)(h))
        h = nn.Dense(d_model, name="linear_second")(h)
        h = nn.relu(nn.Dropout(0.5, deterministic=not training)(h))
        for _ in range(self.num_layers):
            h = _EncoderLayer(d_model, self.n_heads)(h, training)
        h = nn.relu(nn.Dropout(0.5, deterministic=not training)(h))
        h = nn.Dense(d_model, name="linear_after_transformer")(h)
        return h.reshape(B, L, out_joints, 2)
