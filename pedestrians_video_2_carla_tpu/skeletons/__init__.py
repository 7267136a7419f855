"""Skeleton definitions, registries and cross-skeleton mappings (reference L0
layer: ``data/base/skeleton.py``, ``data/{carla,openpose,smpl,mpii}/skeleton.py``)."""
from .base import (MAPPINGS, SKELETONS, Skeleton, get_common_indices,
                   get_skeleton_name_by_type, get_skeleton_type_by_name,
                   map_pose, register_skeleton)
from .carla import (AGE_GENDER_KEYS, BONE_NAMES, CARLA_SKELETON, NUM_BONES,
                    PARENTS, TOPO_LEVELS, age_gender_to_index,
                    load_reference_pose, load_reference_pose_carla,
                    reference_poses_tensor)
from .mpii import MPII_SKELETON
from .openpose import BODY_25_SKELETON, COCO_SKELETON
from .smpl import SMPL_SKELETON

__all__ = [
    "Skeleton", "SKELETONS", "MAPPINGS", "register_skeleton",
    "get_common_indices", "get_skeleton_type_by_name",
    "get_skeleton_name_by_type", "map_pose",
    "CARLA_SKELETON", "BODY_25_SKELETON", "COCO_SKELETON", "SMPL_SKELETON",
    "MPII_SKELETON", "BONE_NAMES", "PARENTS", "NUM_BONES", "TOPO_LEVELS",
    "AGE_GENDER_KEYS", "age_gender_to_index", "load_reference_pose",
    "load_reference_pose_carla", "reference_poses_tensor",
]
