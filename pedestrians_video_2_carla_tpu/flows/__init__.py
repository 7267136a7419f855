"""Flow registry (reference ``modeling.py:313-325`` ``discover_available_classes``)."""
from typing import Dict


def available_flows() -> Dict[str, type]:
    from .autoencoder import AutoencoderFlow
    from .classification import ClassificationFlow
    from .pose_estimation import PoseEstimationFlow
    from .pose_lifting import PoseLiftingFlow
    return {
        "pose_lifting": PoseLiftingFlow,
        "autoencoder": AutoencoderFlow,
        "classification": ClassificationFlow,
        "pose_estimation": PoseEstimationFlow,
    }
