"""CARLA pedestrian skeleton: 26-bone tree, static FK arrays, UE4 reference poses.

Re-implements the ``CARLA_SKELETON`` enum + structure data the reference pulls from its
``pedestrians_scenarios`` ("karma") dependency and from
``data/carla/files/{structure,sk_*_relative}.yaml`` (reference ``data/carla/utils.py:16-77``).
The bone order is the depth-first traversal of the UE4 skeleton tree, which is also the
tensor bone-dimension order everywhere.

TPU-first design: the tree is exported as
  * ``PARENTS``        -- (26,) parent index per bone (-1 for root)
  * ``TOPO_LEVELS``    -- bones grouped by tree depth; bones within a level are
                          independent, so forward kinematics is 8 batched level steps
                          instead of the reference's 26-step Python recursion
                          (``walker_control/p3d_pose.py:116-149``).
"""
import json
import os
from functools import lru_cache
from typing import Dict, List, Tuple

import numpy as np

from .base import Skeleton, register_skeleton

_FILES_DIR = os.path.join(os.path.dirname(__file__), "files")

with open(os.path.join(_FILES_DIR, "structure.json")) as _f:
    _STRUCTURE = json.load(_f)

BONE_NAMES: List[str] = _STRUCTURE["names"]
PARENTS: np.ndarray = np.asarray(_STRUCTURE["parents"], dtype=np.int32)
NUM_BONES: int = len(BONE_NAMES)

CARLA_SKELETON = Skeleton("CARLA_SKELETON", [(n, i) for i, n in enumerate(BONE_NAMES)])


def _compute_levels(parents: np.ndarray) -> List[np.ndarray]:
    depth = np.zeros(len(parents), dtype=np.int32)
    for i, p in enumerate(parents):
        depth[i] = 0 if p < 0 else depth[p] + 1
    return [np.nonzero(depth == d)[0].astype(np.int32)
            for d in range(int(depth.max()) + 1)]


#: bones grouped by depth; level 0 is the root
TOPO_LEVELS: List[np.ndarray] = _compute_levels(PARENTS)


def _carla_get_colors() -> Dict[Skeleton, Tuple[int, int, int, int]]:
    # simple green scheme matching karma's renderer defaults
    return {k: (0, 255, 0, 255) for k in CARLA_SKELETON}


def _carla_get_edges():
    return [(CARLA_SKELETON(int(PARENTS[i])), CARLA_SKELETON(i))
            for i in range(NUM_BONES) if PARENTS[i] >= 0]


def _carla_get_neck_point():
    return CARLA_SKELETON.crl_neck__C


def _carla_get_hips_point():
    return CARLA_SKELETON.crl_hips__C


def _carla_get_flip_mask() -> Tuple[int, ...]:
    # swap __L <-> __R bones, keep __C / root in place
    mask = []
    for name in BONE_NAMES:
        if name.endswith("__L"):
            mask.append(BONE_NAMES.index(name[:-3] + "__R"))
        elif name.endswith("__R"):
            mask.append(BONE_NAMES.index(name[:-3] + "__L"))
        else:
            mask.append(BONE_NAMES.index(name))
    return tuple(mask)


CARLA_SKELETON.get_colors = classmethod(lambda cls: _carla_get_colors())
CARLA_SKELETON.get_edges = classmethod(lambda cls: _carla_get_edges())
CARLA_SKELETON.get_neck_point = classmethod(lambda cls: _carla_get_neck_point())
CARLA_SKELETON.get_hips_point = classmethod(lambda cls: _carla_get_hips_point())
CARLA_SKELETON.get_flip_mask = classmethod(lambda cls: _carla_get_flip_mask())

register_skeleton("CARLA_SKELETON", CARLA_SKELETON, [(k, k) for k in CARLA_SKELETON])


# ---------------------------------------------------------------------------
# UE4 reference poses
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _reference_poses_raw() -> Dict[str, dict]:
    with open(os.path.join(_FILES_DIR, "reference_poses.json")) as f:
        return json.load(f)


AGE_GENDER_KEYS = ("adult_female", "adult_male", "child_female", "child_male")


def reference_pose_key(age: str, gender: str) -> str:
    return f"{age}_{gender}"


@lru_cache(maxsize=None)
def load_reference_pose_carla(key: str = "adult_female"):
    """Reference relative pose in **CARLA units/convention**.

    Returns ``(loc, rot_pyr, root_hips_transform)`` where ``loc`` is (26, 3) in
    meters (UE4 cm / 100), ``rot_pyr`` is (26, 3) degrees ``(pitch, yaw, roll)``,
    and ``root_hips_transform`` is ``(hips_location_m, root_rotation_pyr_deg)``.
    Hips location is re-zeroed and kept as the root<->hips offset, matching
    reference ``data/carla/utils.py:49-77``.
    """
    raw = _reference_poses_raw()[key]
    loc = np.asarray([raw[n]["location"] for n in BONE_NAMES], dtype=np.float64) / 100.0
    rot = np.asarray([raw[n]["rotation"] for n in BONE_NAMES], dtype=np.float64)

    hips = int(CARLA_SKELETON.crl_hips__C)
    root = int(CARLA_SKELETON.crl_root)
    root_hips_transform = (loc[hips].copy(), rot[root].copy())
    loc[hips] = 0.0
    return loc, rot, root_hips_transform


@lru_cache(maxsize=None)
def load_reference_pose(key: str = "adult_female"):
    """Reference relative pose in the **P3D tensor convention** used by the
    numerical core: locations ``(x, y, -z)`` meters, rotations as (26, 3, 3)
    matrices built from radians ``(-roll, -pitch, -yaw)`` with euler order "XYZ"
    (reference ``walker_control/p3d_pose.py:34-54``).

    Returns float32 ``(rel_loc (26,3), rel_rot (26,3,3))`` numpy arrays.
    """
    from ..ops.rotations import euler_angles_to_matrix_np

    loc, rot_pyr, _ = load_reference_pose_carla(key)
    p3d_loc = np.stack([loc[:, 0], loc[:, 1], -loc[:, 2]], axis=-1)
    angles = np.deg2rad(
        np.stack([-rot_pyr[:, 2], -rot_pyr[:, 0], -rot_pyr[:, 1]], axis=-1))
    p3d_rot = euler_angles_to_matrix_np(angles, "XYZ")
    return p3d_loc.astype(np.float32), p3d_rot.astype(np.float32)


def reference_poses_tensor():
    """All four reference skeletons stacked: ``(rel_loc (4,26,3), rel_rot (4,26,3,3))``
    float32, indexed by ``AGE_GENDER_KEYS`` order. Lets per-clip age/gender selection
    be a single gather inside jit instead of per-pedestrian Python objects
    (reference creates one ``ControlledPedestrian`` per clip per batch,
    ``modules/layers/projection.py:52-71``)."""
    locs, rots = zip(*[load_reference_pose(k) for k in AGE_GENDER_KEYS])
    return np.stack(locs), np.stack(rots)


#: substitutions for dataset labels not present in CARLA (reference
#: ``transforms/pose/normalization/reference_skeletons_denormalizer.py:10-29``)
AGE_MAPPINGS = {"adult": "adult", "child": "child",
                "senior": "adult", "young": "child"}
GENDER_MAPPINGS = {"female": "female", "male": "male", "neutral": "female"}


def age_gender_to_index(age, gender) -> int:
    """Map (age, gender) strings to an index into ``AGE_GENDER_KEYS``;
    unknown / NaN values fall back to 'adult' / 'female'."""
    age = AGE_MAPPINGS.get(str(age), "adult")
    gender = GENDER_MAPPINGS.get(str(gender), "female")
    return AGE_GENDER_KEYS.index(f"{age}_{gender}")
