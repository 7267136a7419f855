"""Pose-estimation base + Linear baseline (reference
``modules/pose_estimation/pose_estimation.py:5``, ``linear.py``)."""
from typing import Type

import flax.linen as nn

from ...flows.output_types import PoseEstimationModelOutputType
from ...skeletons.base import Skeleton
from ...skeletons.carla import CARLA_SKELETON


class PoseEstimationModel(nn.Module):
    input_nodes: Type[Skeleton] = CARLA_SKELETON
    output_nodes: Type[Skeleton] = CARLA_SKELETON

    needs_confidence: bool = False
    needs_graph = False
    needs_heatmaps = False
    needs_targets = False

    @property
    def output_type(self) -> PoseEstimationModelOutputType:
        return PoseEstimationModelOutputType.pose_2d

    @property
    def eval_slice(self):
        return slice(None)


class Linear(PoseEstimationModel):
    """Dense layer from flattened per-frame input to 2D joints."""

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        h = x.reshape(B, L, -1)
        out = nn.Dense(out_joints * 2)(h)
        return out.reshape(B, L, out_joints, 2)
