"""Gym RL environment scaffolding (reference ``gym_carla_pedestrians/``):
action = per-bone rotation deltas + teleport, observation = relative/absolute
pose + 2D projection, zero reward. Registered as ``CarlaPedestrians-v0``."""
try:
    from gymnasium.envs.registration import register

    register(id="CarlaPedestrians-v0",
             entry_point="pedestrians_video_2_carla_tpu.gym_carla_pedestrians"
                         ".envs:CarlaPedestriansEnv")
except ImportError:  # gymnasium optional
    pass

from .envs import CarlaPedestriansEnv  # noqa: E402,F401
from .wrappers import (CarlaRenderWrapper,  # noqa: E402,F401
                       NumpyToDictActionWrapper, PoseOverlayRenderWrapper)
