"""Pose augmentation: random left/right flip and in-plane rotation with exact
inversion, as pure PRNG-keyed functions.

Re-designs reference ``transforms/pose/augmentation/{augment_pose,random_flip,
random_rotation}.py`` (in-place torch mutation + boolean indexing) into
functional ``jnp.where``-based ops usable inside jit-compiled input pipelines.
Semantics preserved: flips permute joints by the skeleton flip mask and mirror x
around the bbox center (shifting bboxes as if the *image* was flipped when the
clip size is known), rotations spin around the bbox center; missing joints
(exact zeros) stay zero; applying ``invert`` with the returned parameters
restores the original pose (rotation first, then flip — reference
``augment_pose.py:74-104``).
"""
from typing import NamedTuple, Optional, Tuple, Type

import jax
import jax.numpy as jnp

from ..skeletons.base import Skeleton
from .tensors import get_bboxes, get_missing_joints_mask


class AugmentParams(NamedTuple):
    is_flipped: jnp.ndarray  # (B,) bool
    rotation: jnp.ndarray    # (B,) degrees


def _centers(pose: jnp.ndarray, bboxes: Optional[jnp.ndarray]) -> jnp.ndarray:
    if bboxes is None:
        bboxes = get_bboxes(pose[..., :2])
    return bboxes.mean(axis=-2, keepdims=True)  # (B, L, 1, 2)


def flip_pose(pose: jnp.ndarray, is_flipped: jnp.ndarray,
              skeleton: Type[Skeleton],
              bboxes: Optional[jnp.ndarray] = None,
              clip_size: Optional[jnp.ndarray] = None
              ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Mirror selected clips left<->right.

    :param pose: (B, L, J, 2|3) pose (optional confidence channel rides along).
    :param is_flipped: (B,) bool.
    :param clip_size: (B, 2) source video (width, height) or None.
    :return: (flipped pose, updated bboxes or None).
    """
    missing = ~get_missing_joints_mask(pose[..., :2])
    flip_mask = jnp.asarray(skeleton.get_flip_mask())
    permuted = pose[..., flip_mask, :]

    # Mirror relative to the *original* bbox center, then translate to the
    # center the bbox would have if the whole image had been flipped —
    # reference ``random_flip.py``: sub_(centers) happens before bboxes/centers
    # are updated, add_(centers) after, so x' = W - x when the clip size is
    # known (not 2*c_new - x).
    centers = _centers(pose, bboxes)
    add_centers = centers
    new_bboxes = bboxes
    if bboxes is not None and clip_size is not None:
        # where the bbox would sit if the *image* had been flipped
        half_w = clip_size[..., 0][..., None, None] / 2.0
        flipped_x = -(bboxes[..., 0] - half_w) + half_w
        flipped_x = jnp.flip(flipped_x, axis=-1)  # min/max swap after mirror
        valid = jnp.all(clip_size > 0)
        cand = jnp.stack([flipped_x, bboxes[..., 1]], axis=-1)
        new_bboxes = jnp.where(valid & is_flipped[:, None, None, None],
                               cand, bboxes)
        add_centers = jnp.where(is_flipped[:, None, None, None],
                                new_bboxes.mean(axis=-2, keepdims=True),
                                centers)

    flipped_x = -(permuted[..., 0] - centers[..., 0]) + add_centers[..., 0]
    flipped = jnp.concatenate(
        [flipped_x[..., None], permuted[..., 1:]], axis=-1)
    out = jnp.where(is_flipped[:, None, None, None], flipped, pose)
    out = jnp.where(missing[..., None], 0.0, out)
    return out, new_bboxes


def rotate_pose(pose: jnp.ndarray, rotation_deg: jnp.ndarray,
                bboxes: Optional[jnp.ndarray] = None
                ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Rotate each clip's 2D pose around its bbox center.

    :param pose: (B, L, J, 2|3).
    :param rotation_deg: (B,) degrees.
    :return: (rotated pose, enlarged bboxes or None).
    """
    missing = ~get_missing_joints_mask(pose[..., :2])
    centers = _centers(pose, bboxes)
    rad = jnp.deg2rad(rotation_deg)
    cos, sin = jnp.cos(rad), jnp.sin(rad)
    rot = jnp.stack([jnp.stack([cos, -sin], -1),
                     jnp.stack([sin, cos], -1)], -2)  # (B, 2, 2)
    rot = rot[:, None]  # (B, 1, 2, 2) broadcast over frames

    coords = pose[..., :2] - centers
    coords = jnp.einsum("bljk,blkm->bljm", coords, jnp.broadcast_to(
        rot, (pose.shape[0], pose.shape[1], 2, 2))) + centers
    out = jnp.concatenate([coords, pose[..., 2:]], axis=-1) \
        if pose.shape[-1] > 2 else coords
    out = jnp.where(missing[..., None], 0.0, out)

    new_bboxes = bboxes
    if bboxes is not None:
        other = jnp.stack([
            jnp.stack([bboxes[..., 0, 0], bboxes[..., 1, 1]], -1),
            jnp.stack([bboxes[..., 1, 0], bboxes[..., 0, 1]], -1)], -2)
        corners = jnp.concatenate([bboxes, other], axis=-2) - centers
        corners = jnp.einsum("bljk,blkm->bljm", corners, jnp.broadcast_to(
            rot, (bboxes.shape[0], bboxes.shape[1], 2, 2))) + centers
        new_bboxes = jnp.stack(
            [corners.min(axis=-2), corners.max(axis=-2)], axis=-2)
    return out, new_bboxes


class AugmentPose:
    """Randomized flip+rotate with exact inversion (reference
    ``augment_pose.py:12-104``). Pure: pass a PRNG key, get params back."""

    def __init__(self, nodes: Type[Skeleton],
                 flip=False, rotate=False) -> None:
        self.nodes = nodes
        self.flip_prob = (flip if isinstance(flip, float) else 0.5) if flip else 0.0
        self.max_rotation = (rotate if isinstance(rotate, float) else 10.0) \
            if rotate else 0.0

    def __call__(self, key: jax.Array, pose: jnp.ndarray,
                 bboxes: Optional[jnp.ndarray] = None,
                 clip_size: Optional[jnp.ndarray] = None
                 ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], AugmentParams]:
        batch = pose.shape[0]
        k_flip, k_rot = jax.random.split(key)
        is_flipped = jax.random.uniform(k_flip, (batch,)) < self.flip_prob
        rotation = (jax.random.uniform(k_rot, (batch,)) * 2.0 - 1.0) \
            * self.max_rotation

        if bboxes is None:
            # always track bboxes: the augmented bbox center is the anchor
            # that makes ``invert`` exact (reference ``augment_pose.py:55-58``)
            bboxes = get_bboxes(pose[..., :2])
        out = pose
        if self.flip_prob > 0:
            out, bboxes = flip_pose(out, is_flipped, self.nodes,
                                    bboxes, clip_size)
        if self.max_rotation > 0:
            out, bboxes = rotate_pose(out, rotation, bboxes)
        return out, bboxes, AugmentParams(is_flipped, rotation)

    def invert(self, pose: jnp.ndarray, params: AugmentParams,
               bboxes: Optional[jnp.ndarray] = None,
               clip_size: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """Undo augmentation: rotation first (negated), then the same flip.
        Pass the ``bboxes`` returned by ``__call__`` for exact inversion —
        the rotated AABB's center coincides with the pre-rotation center."""
        if bboxes is None:
            bboxes = get_bboxes(pose[..., :2])
        out = pose
        if self.max_rotation > 0:
            out, bboxes = rotate_pose(out, -params.rotation, bboxes)
        if self.flip_prob > 0:
            out, _ = flip_pose(out, params.is_flipped, self.nodes,
                               bboxes, clip_size)
        return out
