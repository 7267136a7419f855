"""Host-side walker control: CARLA-dict pose API, pedestrian object, camera
projection wrappers, and the live-CARLA endpoint (reference ``walker_control/``).
The TPU-side math lives in ``ops``; this layer adapts it to CARLA types."""
from .carla_utils import carla, mock_carla, using_mock_carla
from .controlled_pedestrian import ControlledPedestrian
from .pose import Pose
from .pose_projection import PoseProjection, RGBCameraMock
