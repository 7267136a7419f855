"""Pose metrics: MPJPE, MRPE, PCK, MissingJointsRatio, MSE multi-input wrapper
(reference ``metrics/{mpjpe,mrpe,pck,missing_joints_ratio,multiinput_wrapper}.py``).
"""
from typing import Optional, Type

import jax.numpy as jnp

from ..ops.kinematics import world_from_changes
from ..ops.normalization import hips_neck_shift_scale
from ..ops.tensors import get_bboxes, get_missing_joints_mask
from ..skeletons.base import (Skeleton, common_hips_index,
                              get_common_indices)
from ..skeletons.carla import CARLA_SKELETON
from .base import Metric, safe_div




class MPJPE(Metric):
    """Mean Per Joint Position Error in mm; per-clip mean over joints+frames,
    then mean over clips (reference ``mpjpe.py:8-45``)."""

    def __init__(self, input_nodes: Type[Skeleton] = CARLA_SKELETON,
                 output_nodes: Type[Skeleton] = CARLA_SKELETON):
        self.output_indices, self.input_indices = get_common_indices(
            input_nodes, output_nodes)

    def init_state(self):
        return {"errors": jnp.zeros(()), "total": jnp.zeros((), jnp.int32)}

    def update(self, state, preds, targets):
        if preds.get("absolute_pose_loc") is None \
                or targets.get("absolute_pose_loc") is None:
            return state
        pred = preds["absolute_pose_loc"][:, :, self.output_indices]
        gt = targets["absolute_pose_loc"][:, :, self.input_indices]
        per_clip = jnp.mean(jnp.linalg.norm(pred - gt, axis=-1), axis=(-2, -1))
        return {"errors": state["errors"] + jnp.sum(per_clip),
                "total": state["total"] + per_clip.size}

    def compute(self, state):
        return 1000.0 * safe_div(state["errors"], state["total"])


class MRPE(Metric):
    """Mean Root (hips) Position Error in mm, including the world track
    (reference ``mrpe.py:9-76``)."""

    def __init__(self, input_nodes: Type[Skeleton] = CARLA_SKELETON,
                 output_nodes: Type[Skeleton] = CARLA_SKELETON):
        self.input_nodes = input_nodes
        self.output_nodes = output_nodes

    def init_state(self):
        return {"errors": jnp.zeros(()), "total": jnp.zeros((), jnp.int32)}

    def update(self, state, preds, targets):
        if preds.get("absolute_pose_loc") is None \
                or targets.get("absolute_pose_loc") is None \
                or targets.get("world_loc_changes") is None:
            return state
        pred_pose = preds["absolute_pose_loc"]
        target_pose = targets["absolute_pose_loc"]
        B, L = pred_pose.shape[:2]

        if preds.get("world_loc_changes") is not None:
            pred_world, _ = world_from_changes(
                (B, L), preds["world_loc_changes"])
        elif preds.get("world_loc") is not None:
            pred_world = preds["world_loc"]
        else:
            pred_world = jnp.zeros((B, L, 3), pred_pose.dtype)
        target_world, _ = world_from_changes(
            (B, L), targets["world_loc_changes"])

        pred_hips = hips_neck_shift_scale(pred_pose, self.output_nodes).shift
        target_hips = hips_neck_shift_scale(target_pose, self.input_nodes).shift

        err = jnp.linalg.norm(
            (pred_world + pred_hips) - (target_world + target_hips), axis=-1)
        per_clip = jnp.mean(err, axis=-1)
        return {"errors": state["errors"] + jnp.sum(per_clip),
                "total": state["total"] + per_clip.size}

    def compute(self, state):
        return 1000.0 * safe_div(state["errors"], state["total"])


class PCK(Metric):
    """Percentage of Correct Keypoints within ``threshold`` of a normalized
    distance ('hn' hips-neck or 'bbox' diagonal; reference ``pck.py:12-98``)."""

    def __init__(self, input_nodes: Type[Skeleton] = CARLA_SKELETON,
                 output_nodes: Type[Skeleton] = CARLA_SKELETON,
                 mask_missing_joints: bool = True,
                 key: str = "projection_2d",
                 threshold: float = 0.05,
                 normalization: str = "bbox",
                 near_zero: float = 1e-5):
        self.input_nodes = input_nodes
        self.output_indices, self.input_indices = get_common_indices(
            input_nodes, output_nodes)
        self.key = key
        self.threshold = threshold
        self.normalization = normalization
        self.mask_missing_joints = mask_missing_joints
        self.near_zero = near_zero
        self._hips = common_hips_index(input_nodes, self.input_indices)

    def _norm_dist(self, sample):
        if self.normalization == "hn":
            return hips_neck_shift_scale(sample, self.input_nodes).scale
        bboxes = get_bboxes(sample)
        return jnp.linalg.norm(bboxes[..., 1, :] - bboxes[..., 0, :], axis=-1)

    def init_state(self):
        return {"correct": jnp.zeros((), jnp.int32),
                "total": jnp.zeros((), jnp.int32)}

    def update(self, state, preds, targets):
        if preds.get(self.key) is None or targets.get(self.key) is None:
            return state
        pred = preds[self.key][:, :, self.output_indices, :2]
        gt = targets[self.key][:, :, self.input_indices, :2]

        if self.mask_missing_joints and targets.get("projection_2d") is not None:
            raw = targets["projection_2d"][:, :, self.input_indices]
            mask = get_missing_joints_mask(raw, self._hips)
        else:
            mask = jnp.ones(gt.shape[:-1], dtype=bool)

        normalize = self._norm_dist(targets[self.key][..., :2])
        mask = mask & (normalize >= self.near_zero)[..., None]
        normalize = jnp.where(normalize < self.near_zero, 1.0, normalize)
        norm_dist = jnp.linalg.norm(pred - gt, axis=-1) / normalize[..., None]

        correct = jnp.sum((norm_dist < self.threshold) & mask)
        return {"correct": state["correct"] + correct,
                "total": state["total"] + jnp.sum(mask)}

    def compute(self, state):
        return safe_div(state["correct"].astype(jnp.float32), state["total"])


class MissingJointsRatio(Metric):
    """Fraction of missing (exact-zero) joints in the 2D predictions, optionally
    per joint (reference ``missing_joints_ratio.py:9-77``)."""

    def __init__(self, input_nodes: Type[Skeleton] = CARLA_SKELETON,
                 output_nodes: Type[Skeleton] = CARLA_SKELETON,
                 report_per_joint: bool = False):
        self.output_indices, self.input_indices = get_common_indices(
            input_nodes, output_nodes)
        if isinstance(self.output_indices, slice):
            self.num_joints = len(output_nodes)
        else:
            self.num_joints = len(self.output_indices)
        self.report_per_joint = report_per_joint

    def init_state(self):
        return {"present": jnp.zeros((self.num_joints,)),
                "total": jnp.zeros((), jnp.int32)}

    def update(self, state, preds, targets):
        if preds.get("projection_2d") is None:
            return state
        pred = preds["projection_2d"][:, :, self.output_indices]
        present = jnp.all(pred != 0, axis=-1)
        count = present.size // self.num_joints  # static shape product
        return {"present": state["present"]
                + jnp.sum(present, axis=tuple(range(present.ndim - 1))),
                "total": state["total"] + count}

    def compute(self, state):
        ratio = 1.0 - safe_div(state["present"], state["total"])
        if self.report_per_joint:
            return {"overall": jnp.mean(ratio),
                    **{str(i): ratio[i] for i in range(self.num_joints)}}
        return jnp.mean(ratio)


class MultiinputMSE(Metric):
    """MSE between ``preds[key]`` and ``targets[key]`` over common joints
    (the reference adapts torchmetrics.MeanSquaredError through
    ``MultiinputWrapper``, ``multiinput_wrapper.py:9-69``)."""

    def __init__(self, key: str = "projection_2d_transformed",
                 input_nodes: Type[Skeleton] = CARLA_SKELETON,
                 output_nodes: Type[Skeleton] = CARLA_SKELETON,
                 mask_missing_joints: bool = True):
        self.key = key
        self.output_indices, self.input_indices = get_common_indices(
            input_nodes, output_nodes)
        self.mask_missing_joints = mask_missing_joints
        self._hips = common_hips_index(input_nodes, self.input_indices)

    def init_state(self):
        return {"sq": jnp.zeros(()), "n": jnp.zeros((), jnp.int32)}

    def update(self, state, preds, targets):
        if preds.get(self.key) is None or targets.get(self.key) is None:
            return state
        pred = preds[self.key][..., self.output_indices, :2]
        gt = targets[self.key][..., self.input_indices, :2]
        if self.mask_missing_joints:
            mask = get_missing_joints_mask(gt, self._hips)[..., None]
            sq = jnp.sum(((pred - gt) ** 2) * mask)
            n = jnp.sum(mask) * pred.shape[-1]
        else:
            sq = jnp.sum((pred - gt) ** 2)
            n = pred.size
        return {"sq": state["sq"] + sq, "n": state["n"] + n}

    def compute(self, state):
        return safe_div(state["sq"], state["n"])
