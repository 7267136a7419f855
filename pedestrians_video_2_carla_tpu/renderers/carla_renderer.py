"""Live-CARLA renderer: spawn a walker, apply per-frame predicted poses +
teleports, drain the RGB camera queue (reference
``renderers/carla_renderer.py:28-211``). Requires a reachable CARLA server;
degrades to black frames with the mock client (as the reference's tests do).
"""
from queue import Empty, Queue
from typing import Iterable

import numpy as np

from ..skeletons.carla import BONE_NAMES
from ..walker_control.carla_utils import (carla, destroy_client_and_world,
                                          setup_camera,
                                          setup_client_and_world,
                                          using_mock_carla)
from ..walker_control.controlled_pedestrian import ControlledPedestrian
from ..walker_control.pose import Pose
from .renderer import Renderer


class CarlaRenderer(Renderer):
    def __init__(self, fps: float = 30.0, timeout: float = 10.0, **kwargs):
        super().__init__(**kwargs)
        self.fps = fps
        self.timeout = timeout

    def render(self, relative_pose_loc=None, relative_pose_rot=None,
               world_loc=None, world_rot=None, meta=None,
               **kwargs) -> Iterable[np.ndarray]:
        batch = len(relative_pose_rot)
        clip_length = relative_pose_rot.shape[1]
        if using_mock_carla():
            for _ in range(batch):
                yield self.zeros(clip_length)
            return

        client, world = setup_client_and_world(fps=self.fps)
        try:
            for idx in range(batch):
                yield self.render_clip(
                    world,
                    np.asarray(relative_pose_loc[idx]),
                    np.asarray(relative_pose_rot[idx]),
                    np.asarray(world_loc[idx])
                    if world_loc is not None else None,
                    np.asarray(world_rot[idx])
                    if world_rot is not None else None,
                    age=(meta or {}).get("age", ["adult"] * batch)[idx],
                    gender=(meta or {}).get("gender",
                                            ["female"] * batch)[idx])
        finally:
            destroy_client_and_world(client, world)

    def render_clip(self, world, rel_loc, rel_rot, world_loc, world_rot,
                    age: str, gender: str) -> np.ndarray:
        from ..ops.rotations import matrix_to_carla_rotation as m2c
        import jax.numpy as jnp

        pedestrian = ControlledPedestrian(world, age, gender,
                                          reference_pose=Pose)
        sensor_queue: Queue = Queue()
        camera = setup_camera(world, sensor_queue, pedestrian,
                              image_size=self._image_size)
        frames = []
        clip_length = len(rel_rot)
        try:
            prev_loc = np.zeros(3)
            for i in range(clip_length):
                pose = pedestrian.current_pose.relative
                pyr = np.asarray(m2c(jnp.asarray(rel_rot[i])))
                for j, name in enumerate(BONE_NAMES):
                    pose[name].rotation = carla.Rotation(
                        pitch=float(pyr[j, 0]), yaw=float(pyr[j, 1]),
                        roll=float(pyr[j, 2]))
                pedestrian.current_pose.relative = pose
                pedestrian.apply_pose()
                if world_loc is not None:
                    delta = world_loc[i] - prev_loc
                    prev_loc = world_loc[i]
                    pedestrian.teleport_by(carla.Transform(
                        location=carla.Location(
                            x=float(delta[0]), y=float(delta[1]),
                            z=float(-delta[2]))))
                world.tick()
                try:
                    image = sensor_queue.get(timeout=self.timeout)
                    array = np.frombuffer(image.raw_data, dtype=np.uint8)
                    array = array.reshape(
                        (image.height, image.width, 4))[..., 2::-1]
                    frames.append(array.copy())
                except Empty:
                    frames.append(self.zeros(1)[0])
        finally:
            camera.stop()
            camera.destroy()
            if pedestrian.walker is not None:
                pedestrian.walker.destroy()
        return np.stack(frames) if frames else self.zeros(clip_length)
