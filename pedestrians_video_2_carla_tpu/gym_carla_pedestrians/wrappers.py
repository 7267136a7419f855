"""Gym wrappers (reference ``gym_carla_pedestrians/wrappers/``): flat-array
action adapter, CARLA camera rendering, and skeleton-overlay rendering —
ported to gymnasium's wrapper API."""
from collections import OrderedDict
from typing import Any, Optional

import numpy as np

from ..skeletons.carla import BONE_NAMES
from ..walker_control.carla_utils import using_mock_carla

try:
    import gymnasium as gym
except ImportError:  # pragma: no cover
    gym = None


class NumpyToDictActionWrapper(gym.ActionWrapper if gym else object):
    """(28, 3) float array -> the env's Dict action (reference
    ``np_to_dict_action_wrapper.py:8-35``): row 0 = teleport location,
    row 1 = [pitch, yaw, roll] with only yaw used, rows 2.. = per-bone
    rotations in CARLA bone order."""

    def action(self, action: np.ndarray) -> OrderedDict:
        action = np.asarray(action, dtype=np.float32)
        return OrderedDict({
            "teleport_by": {
                "location": action[0, :],
                "rotation": action[1, 1:2],  # yaw only
            },
            "update_pose": dict(zip(BONE_NAMES, action[2:, :])),
        })


class CarlaRenderWrapper(gym.Wrapper if gym else object):
    """Adds ``rgb_array`` rendering (reference
    ``carla_render_wrapper.py:19-104``: spawns a client/world, binds the
    pedestrian and drains a synchronous camera queue). With the mock carla
    module (no server) it renders a blank canvas — stack
    ``PoseOverlayRenderWrapper`` on top for a skeleton view."""

    def __init__(self, env, fps: float = 30.0):
        super().__init__(env)
        self.metadata = {**self.env.metadata,
                         "render_modes":
                         sorted({*self.env.metadata.get("render_modes", []),
                                 "rgb_array"}),
                         "render_fps": fps}
        self._fps = fps
        self._client = None
        self._world = None
        self._sensors = None
        self._camera_queue = None

    def reset(self, **kwargs) -> Any:
        self.close_carla()
        out = super().reset(**kwargs)
        if not using_mock_carla():
            from queue import Queue

            from ..walker_control.carla_utils import (setup_camera,
                                                      setup_client_and_world)
            self._client, self._world = setup_client_and_world(fps=self._fps)
            pedestrian = self.unwrapped.pedestrian
            pedestrian.bind(self._world)
            self._camera_queue = Queue()
            camera = setup_camera(self._world, self._camera_queue, pedestrian)
            self._sensors = {"camera_rgb": camera}
        return out

    def close_carla(self):
        if self._client is not None and self._world is not None:
            from ..walker_control.carla_utils import destroy_client_and_world
            destroy_client_and_world(self._client, self._world, self._sensors)
        self._client = self._world = self._sensors = None

    def close(self):
        super().close()
        self.close_carla()

    def render(self) -> Optional[np.ndarray]:
        if self._world is not None and self._camera_queue is not None:
            self._world.tick()
            try:
                image = self._camera_queue.get(timeout=2.0)
                arr = np.frombuffer(image.raw_data, dtype=np.uint8)
                return arr.reshape(image.height, image.width, 4)[..., :3]
            except Exception:
                return None
        w, h = 800, 600
        proj = getattr(self.unwrapped, "_pose_projection", None)
        if proj is not None:
            w, h = proj.image_size
        return np.zeros((h, w, 3), dtype=np.uint8)


class PoseOverlayRenderWrapper(gym.Wrapper if gym else object):
    """Draws the current 2D pose projection over rendered frames (reference
    ``pose_overlay_render_wrapper.py:11-52``)."""

    def __init__(self, env):
        super().__init__(env)
        self._last_projection: Optional[np.ndarray] = None
        from ..renderers.points_renderer import PointsRenderer
        self._points = PointsRenderer()

    def _remember(self, observation):
        pts = observation.get("pose_projection")
        if pts is not None:
            self._last_projection = np.asarray(pts, dtype=np.float32)

    def reset(self, **kwargs):
        observation, info = super().reset(**kwargs)
        self._remember(observation)
        return observation, info

    def step(self, action):
        observation, reward, terminated, truncated, info = super().step(action)
        self._remember(observation)
        return observation, reward, terminated, truncated, info

    def render(self) -> Optional[np.ndarray]:
        frame = super().render()
        if frame is None or self._last_projection is None:
            return frame
        frame = np.ascontiguousarray(frame)
        return self._points.render_frame(self._last_projection, canvas=frame)
