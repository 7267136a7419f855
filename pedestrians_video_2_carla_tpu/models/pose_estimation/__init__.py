"""Pose-estimation models (video/heatmaps -> 2D pose). Reference
``modules/pose_estimation/``: UniPoseLSTM (heatmaps, default), P0,
AvPedestrianPoseTransformer, Linear."""
from .linear import Linear, PoseEstimationModel
from .regular import AvPedestrianPoseTransformer, P0
from .unipose_lstm import UniPoseLSTM

POSE_ESTIMATION_MODELS = {
    "Linear": Linear,
    "UniPoseLSTM": UniPoseLSTM,
    "P0": P0,
    "AvPedestrianPoseTransformer": AvPedestrianPoseTransformer,
}


def register_pose_estimation_model(cls):
    POSE_ESTIMATION_MODELS[cls.__name__] = cls
    return cls
