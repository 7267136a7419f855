"""Pose normalization: hips-neck / bbox / fallback shift-scale extraction and
(de)normalization, plus denormalization onto the CARLA reference skeletons.

Re-designs reference ``transforms/pose/normalization/*`` as pure functions on
arrays: extractors return ``(shift (..., 2|3), scale (...))`` per frame; there
is no stateful Normalizer object — jit-compiled data pipelines call these
directly and thread shift/scale through as values (the reference kept
``__last_scale`` state on the Normalizer instance; here `normalize` simply
returns them).

All branching is ``jnp.where``-based (the reference's boolean-indexing fallback
logic is not jit-compatible). NOTE: the reference's
``HipsNeckBBoxFallbackExtractor.get_shift_scale`` assigns the fallback *shift*
through chained advanced indexing (``out_shift[missing_hips][:, 0] = ...``,
``hips_neck_bbox_fallback_extractor.py:28-33``), which writes into a temporary
copy — a silent no-op in torch. This implementation applies the documented
intent (shift falls back to a fixed offset from the bbox center); the scale
fallback behaves identically to the reference.
"""
from typing import NamedTuple, Tuple, Type

import jax.numpy as jnp

from ..skeletons.base import Skeleton
from .tensors import get_bboxes, nan_to_zero

#: empirically-derived CARLA reference constants (reference
#: ``hips_neck_bbox_fallback_extractor.py:16-18``)
FALLBACK_X_SHIFT = 0.0
FALLBACK_Y_SHIFT = -0.1059
FALLBACK_SCALE = 0.5748


class ShiftScale(NamedTuple):
    shift: jnp.ndarray  # (..., C) per-frame shift point
    scale: jnp.ndarray  # (...) per-frame scalar scale


def _safe_norm(v: jnp.ndarray, axis: int = -1,
               eps: float = 1e-12) -> jnp.ndarray:
    """L2 norm whose VJP is finite at exactly-zero vectors.

    ``jnp.linalg.norm`` at 0 produces ``0 * (0/0) = NaN`` cotangents even when
    the *outer* gradient is masked to zero — and a predicted pose whose neck
    and hips land on the same screen pixel (which does happen at model init
    on TPU) then NaNs the whole training step. Clamping the summed squares
    before the sqrt keeps primal values identical above sqrt(eps) and makes
    the gradient exactly zero below it."""
    sq = jnp.sum(v * v, axis=axis)
    return jnp.sqrt(jnp.maximum(sq, eps))


def hips_neck_shift_scale(sample: jnp.ndarray,
                          skeleton: Type[Skeleton]) -> ShiftScale:
    """Shift = hips point (mean over hips joints), scale = ||neck - hips||.
    Reference ``hips_neck_extractor.py:6-14``."""
    hips = sample[..., tuple(skeleton.get_hips_indices()), :].mean(axis=-2)
    neck = sample[..., tuple(skeleton.get_neck_indices()), :].mean(axis=-2)
    scale = _safe_norm(neck - hips, axis=-1)
    return ShiftScale(hips, scale)


def bbox_shift_scale(sample: jnp.ndarray,
                     near_zero: float = 1e-5) -> ShiftScale:
    """Shift = bbox center, scale = ||top-center - center||.
    Reference ``bbox_extractor.py:6-21``."""
    bboxes = get_bboxes(sample, near_zero)
    center = bboxes.mean(axis=-2)
    top_center = jnp.stack(
        [center[..., 0], bboxes[..., 0, 1]], axis=-1)
    scale = _safe_norm(top_center - center, axis=-1)
    return ShiftScale(center, scale)


def hips_neck_bbox_fallback_shift_scale(sample: jnp.ndarray,
                                        skeleton: Type[Skeleton],
                                        near_zero: float = 1e-5) -> ShiftScale:
    """Hips-neck extraction, falling back to scaled-bbox estimates for frames
    where hips and/or neck are missing (reference
    ``hips_neck_bbox_fallback_extractor.py:9-41``; see module docstring for the
    upstream shift no-op)."""
    hn = hips_neck_shift_scale(sample, skeleton)
    neck = sample[..., tuple(skeleton.get_neck_indices()), :].mean(axis=-2)
    bb = bbox_shift_scale(sample, near_zero)

    missing_hips = jnp.all(hn.shift < near_zero, axis=-1)
    missing_neck = jnp.all(neck < near_zero, axis=-1)

    fb_shift = bb.shift + bb.scale[..., None] * jnp.asarray(
        [FALLBACK_X_SHIFT, FALLBACK_Y_SHIFT], dtype=sample.dtype)
    shift = jnp.where(missing_hips[..., None], fb_shift, hn.shift)
    scale = jnp.where(missing_hips | missing_neck,
                      bb.scale * FALLBACK_SCALE, hn.scale)
    return ShiftScale(shift, scale)


EXTRACTORS = {
    "hips_neck": hips_neck_shift_scale,
    "hips_neck_bbox": hips_neck_bbox_fallback_shift_scale,
    "bbox": lambda sample, skeleton, **kw: bbox_shift_scale(sample, **kw),
}


def normalize(sample: jnp.ndarray, shift_scale: ShiftScale, dim: int = 2,
              near_zero: float = 1e-5) -> jnp.ndarray:
    """Shift/scale-normalize pose coordinates; confidence channel (if any) is
    preserved, and points with ~zero confidence are pinned to (0, 0)
    (reference ``normalizer.py:20-41``)."""
    shift, scale = shift_scale
    # clamp degenerate scales: dividing by ~0 produces inf whose nan_to_zero
    # has a NaN *gradient*; the clamped result is zeroed below anyway
    safe_scale = jnp.where(scale < near_zero, 1.0, scale)
    coords = (sample[..., 0:dim] - shift[..., None, :]) \
        / safe_scale[..., None, None]
    coords = jnp.where((scale < near_zero)[..., None, None], 0.0, coords)
    coords = nan_to_zero(coords)
    if dim == 2 and sample.shape[-1] > 2:
        conf = sample[..., 2:]
        coords = jnp.where(conf >= near_zero, coords, 0.0)
        return jnp.concatenate([coords, conf], axis=-1)
    if sample.shape[-1] > dim:
        return jnp.concatenate([coords, sample[..., dim:]], axis=-1)
    return coords


def denormalize(sample: jnp.ndarray, shift_scale: ShiftScale,
                dim: int = 2) -> jnp.ndarray:
    """Inverse of :func:`normalize` (reference ``denormalizer.py:7-28``)."""
    shift, scale = shift_scale
    coords = sample[..., 0:dim] * scale[..., None, None] + shift[..., None, :]
    if sample.shape[-1] > dim:
        return jnp.concatenate([coords, sample[..., dim:]], axis=-1)
    return coords


def normalize_with(sample: jnp.ndarray, skeleton: Type[Skeleton],
                   extractor: str = "hips_neck", dim: int = 2,
                   near_zero: float = 1e-5
                   ) -> Tuple[jnp.ndarray, ShiftScale]:
    """Convenience: extract shift/scale from the first ``dim`` channels and
    normalize; returns ``(normalized, shift_scale)`` so callers can invert."""
    ss = EXTRACTORS[extractor](sample[..., 0:dim], skeleton)
    return normalize(sample, ss, dim=dim, near_zero=near_zero), ss
