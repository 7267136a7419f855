"""Precomputed reference-skeleton tensors (absolute poses + 2D projections of
the four CARLA age/gender skeletons) and denormalization onto them.

Capability parity with reference ``data/carla/reference.py`` (get_relative/
absolute_tensors, get_projections) and
``transforms/pose/normalization/reference_skeletons_denormalizer.py:32-92``
(``from_projection`` / ``from_abs``), re-designed so per-clip age/gender
selection is a gather on stacked (4, 26, ...) tensors inside jit instead of
Python dict lookups per pedestrian.
"""
from functools import lru_cache

import jax.numpy as jnp
import numpy as np

from ..skeletons.carla import CARLA_SKELETON, reference_poses_tensor
from . import camera as C
from . import kinematics as K
from . import normalization as N


@lru_cache(maxsize=None)
def reference_absolute_tensors():
    """FK of the four reference skeletons: ``(abs_loc (4,26,3), abs_rot (4,26,3,3))``
    numpy float32 (reference ``data/carla/reference.py:67-90``).
    ``ensure_compile_time_eval`` keeps this eager even when first invoked
    inside a jit trace (the result is a cached constant)."""
    import jax

    with jax.ensure_compile_time_eval():
        rel_loc, rel_rot = reference_poses_tensor()
        abs_loc, abs_rot = K.forward_kinematics(rel_loc, rel_rot)
        return np.asarray(abs_loc), np.asarray(abs_rot)


@lru_cache(maxsize=None)
def reference_projections():
    """2D screen projections of the reference skeletons: (4, 26, 3) numpy.
    The reference uses a camera at (3.1, 0, 0) looking at the origin for these
    (``data/carla/reference.py:93-120``), i.e. zero elevation."""
    import jax

    with jax.ensure_compile_time_eval():
        abs_loc, _ = reference_absolute_tensors()
        cam = C.make_camera(distance=3.1, shift=0.0, elevation=0.0,
                            look_at=(0.0, 0.0, 0.0))
        return np.asarray(C.project_pose(cam, jnp.asarray(abs_loc)))


def _hips_neck_ss(reference: jnp.ndarray, ndim_target: int) -> N.ShiftScale:
    ss = N.hips_neck_shift_scale(reference, CARLA_SKELETON)
    # broadcast (B, C)/(B,) reference shift/scale over the clip dimension
    while ss.shift.ndim < ndim_target - 1:
        ss = N.ShiftScale(ss.shift[:, None], ss.scale[:, None])
    return ss


def denormalize_from_projection(frames: jnp.ndarray,
                                age_gender_idx: jnp.ndarray,
                                autonormalize: bool = False) -> jnp.ndarray:
    """Scale/shift normalized 2D poses onto the reference skeleton's screen
    projection for each clip's age/gender.

    :param frames: (B, L, J, 2) normalized 2D pose coordinates.
    :param age_gender_idx: (B,) int index into AGE_GENDER_KEYS.
    """
    if autonormalize:
        ss = N.hips_neck_shift_scale(frames[..., :2], CARLA_SKELETON)
        frames = N.normalize(frames, ss, dim=2)
    ref = jnp.asarray(reference_projections()[..., :2])[age_gender_idx]
    return N.denormalize(frames, _hips_neck_ss(ref, frames.ndim), dim=2)


def denormalize_from_abs(frames: jnp.ndarray,
                         age_gender_idx: jnp.ndarray,
                         autonormalize: bool = False) -> jnp.ndarray:
    """Scale/shift (optionally self-normalized) 3D poses onto the reference
    skeleton size for each clip's age/gender (used by the ``absolute_loc``
    movements output types; reference ``projection.py:125-136``).

    :param frames: (B, L, J, 3) pose coordinates.
    :param age_gender_idx: (B,) int index into AGE_GENDER_KEYS.
    """
    if autonormalize:
        ss = N.hips_neck_shift_scale(frames, CARLA_SKELETON)
        frames = N.normalize(frames, ss, dim=3)
    ref = jnp.asarray(reference_absolute_tensors()[0])[age_gender_idx]
    return N.denormalize(frames, _hips_neck_ss(ref, frames.ndim), dim=3)
