"""Pose-estimation models (video/heatmaps -> 2D pose). Reference
``modules/pose_estimation/``; the UniPoseLSTM / P0 / AvPedestrianPoseTransformer
video-backbone models are tracked in later build stages (SURVEY.md §7 step 6) —
the registry mirrors the reference shape with the Linear baseline first."""
from .linear import Linear, PoseEstimationModel

POSE_ESTIMATION_MODELS = {"Linear": Linear}


def register_pose_estimation_model(cls):
    POSE_ESTIMATION_MODELS[cls.__name__] = cls
    return cls
