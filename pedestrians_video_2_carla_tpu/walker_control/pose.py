"""CARLA-dict pose API: ordered ``{bone_name: carla.Transform}`` pose with
recursive FK over the skeleton tree and relative/absolute caching (reference
``walker_control/pose.py:22-165``). The heavy math delegates to the validated
numerical core; this class is the host-side adapter CARLA control code uses.
"""
import time
from collections import OrderedDict
from typing import Dict

import numpy as np

from ..skeletons.carla import (BONE_NAMES, PARENTS, load_reference_pose_carla,
                               reference_pose_key)
from .carla_utils import (carla, deepcopy_transform, mul_carla_rotations,
                          transform_location)

PoseDict = "OrderedDict[str, carla.Transform]"


class Pose:
    def __init__(self, structure=None, **kwargs):
        self._relative_pose = OrderedDict((n, None) for n in BONE_NAMES)
        self._last_rel_mod = time.time_ns()
        self._last_abs_mod = None
        self._last_abs = None

    @staticmethod
    def _deepcopy_pose_dict(pose_dict):
        return OrderedDict(
            (name, deepcopy_transform(t) if t is not None else None)
            for name, t in pose_dict.items())

    @property
    def empty(self):
        return OrderedDict((n, None) for n in BONE_NAMES)

    @property
    def relative(self):
        return self._deepcopy_pose_dict(self._relative_pose)

    @relative.setter
    def relative(self, new_pose_dict):
        self._relative_pose.update(new_pose_dict)
        self._last_rel_mod = time.time_ns()

    @property
    def absolute(self):
        """Component-space transforms (CARLA WalkerBoneControlOut 'component');
        recomputed lazily on relative-pose changes."""
        if self._last_abs_mod != self._last_rel_mod:
            absolute = self.empty
            relative = self.relative
            for i, name in enumerate(BONE_NAMES):
                p = PARENTS[i]
                if p < 0:
                    absolute[name] = deepcopy_transform(relative[name])
                    continue
                parent_t = absolute[BONE_NAMES[p]]
                absolute[name] = carla.Transform(
                    location=transform_location(parent_t,
                                                relative[name].location),
                    rotation=mul_carla_rotations(parent_t.rotation,
                                                 relative[name].rotation))
            self._last_abs = absolute
            self._last_abs_mod = self._last_rel_mod
        return self._deepcopy_pose_dict(self._last_abs)

    def move(self, rotations: Dict[str, "carla.Rotation"]):
        """Merge per-bone rotation deltas into the relative pose (reference
        ``pose.py:156-165``)."""
        new_pose = self.relative
        for bone_name, rotation_change in rotations.items():
            new_pose[bone_name].rotation = mul_carla_rotations(
                new_pose[bone_name].rotation, rotation_change)
        self.relative = new_pose

    # -- tensor bridge -----------------------------------------------------
    def tensors(self):
        """Relative pose as P3D-convention numpy tensors
        ``(loc (26, 3), rot (26, 3, 3))``."""
        from ..ops.rotations import euler_angles_to_matrix_np
        loc = np.asarray([[t.location.x, t.location.y, -t.location.z]
                          for t in self._relative_pose.values()],
                         dtype=np.float32)
        pyr = np.asarray([[t.rotation.pitch, t.rotation.yaw, t.rotation.roll]
                          for t in self._relative_pose.values()])
        angles = np.deg2rad(
            np.stack([-pyr[:, 2], -pyr[:, 0], -pyr[:, 1]], axis=-1))
        rot = euler_angles_to_matrix_np(angles, "XYZ").astype(np.float32)
        return loc, rot


def load_reference_pose_dict(age: str = "adult", gender: str = "female"):
    """Reference relative pose as a CARLA-dict + the root<->hips transform
    (reference ``data/carla/utils.py:40-77``)."""
    loc, pyr, (hips_loc, root_rot) = load_reference_pose_carla(
        reference_pose_key(age, gender))
    pose = OrderedDict()
    for i, name in enumerate(BONE_NAMES):
        pose[name] = carla.Transform(
            location=carla.Location(*loc[i].tolist()),
            rotation=carla.Rotation(pitch=float(pyr[i][0]),
                                    yaw=float(pyr[i][1]),
                                    roll=float(pyr[i][2])))
    root_hips_transform = carla.Transform(
        location=carla.Location(*hips_loc.tolist()),
        rotation=carla.Rotation(pitch=float(root_rot[0]),
                                yaw=float(root_rot[1]),
                                roll=float(root_rot[2])))
    return pose, root_hips_transform
