"""Small tensor utilities (reference ``utils/tensors.py``), written mask-based
so they stay jit/vmap-safe (no boolean indexing)."""
from typing import Optional

import jax.numpy as jnp
import numpy as np


def get_bboxes(sample: jnp.ndarray, near_zero: float = 1e-5) -> jnp.ndarray:
    """Per-frame bounding boxes over the joint axis, ignoring missing points
    (GT exactly ~0 means "not detected"). (..., J, C) -> (..., 2, C) stacked
    (min, max). Reference ``utils/tensors.py:12-27``."""
    missing = jnp.all(sample[..., 0:2] < near_zero, axis=-1, keepdims=True)
    mins = jnp.min(jnp.where(missing, jnp.inf, sample), axis=-2)
    maxs = jnp.max(jnp.where(missing, -jnp.inf, sample), axis=-2)
    return jnp.stack([mins, maxs], axis=-2)


def get_missing_joints_mask(common_gt: jnp.ndarray,
                            hips_index: Optional[int] = None) -> jnp.ndarray:
    """True where the joint is present. Missing joints are encoded as *exact*
    zeros in ground truth; the hips joint is never masked (reference
    ``utils/tensors.py:29-40``).

    :param common_gt: (..., J, C) ground-truth points.
    :param hips_index: index of the hips joint within the common-joint axis,
        or None if hips are not among the common joints.
    """
    mask = jnp.all(common_gt != 0, axis=-1)
    if hips_index is not None:
        mask = mask.at[..., hips_index].set(True)
    return mask


def nan_to_zero(sample: jnp.ndarray) -> jnp.ndarray:
    return jnp.nan_to_num(sample, nan=0.0, posinf=0.0, neginf=0.0)


def atleast_4d(sample: jnp.ndarray) -> jnp.ndarray:
    sample = jnp.asarray(sample)
    while sample.ndim < 4:
        sample = sample[None]
    return sample
