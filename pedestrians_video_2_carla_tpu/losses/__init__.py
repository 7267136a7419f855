"""Loss registry with dependency resolution.

Capability parity with reference ``loss/`` (``LossModes`` enum, primitives
loc_2d / loc_3d / rot_3d / cum_pose_changes / pose_changes / per_joint_loc_2d /
heatmaps and the composite sums with declared dependencies, resolved in
``LitBaseFlow.__init__`` at ``modules/flow/base.py:76-93`` and evaluated in
``_calculate_lossess`` at ``base.py:440-469``).

TPU-first differences:
  * losses are pure functions of a ``LossContext``; no stateful criterion
    objects — masked reductions are ``where``-based so everything jits;
  * "loss not available" (missing target key / None tensor) is a *static*
    property of the batch pytree, so the reference's runtime try/except chain
    becomes trace-time control flow — the compiled step contains exactly the
    losses that can be computed.
"""
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Type

import jax.numpy as jnp

from ..ops.rotations import mm
from ..ops.tensors import get_missing_joints_mask
from ..skeletons.base import (Skeleton, common_hips_index,
                              get_common_indices)


@dataclass
class LossContext:
    """Everything a loss primitive may need (mirrors the kwargs the reference
    feeds into each loss fn, ``base.py:448-460``)."""
    input_nodes: Type[Skeleton]
    output_nodes: Type[Skeleton]
    sliced: Dict[str, Any]            # flow outputs: projection_2d, pose_inputs, ...
    targets: Dict[str, Any]
    requirements: Dict[str, jnp.ndarray] = field(default_factory=dict)
    loss_weights: Dict[str, float] = field(default_factory=dict)
    loss_params: Optional[Sequence[float]] = None
    mask_missing_joints: bool = True


def _masked_mse(pred: jnp.ndarray, gt: jnp.ndarray,
                mask: Optional[jnp.ndarray], reduction: str = "mean"
                ) -> jnp.ndarray:
    """MSE with optional per-joint mask. ``mean`` averages over unmasked
    elements (matching torch's ``criterion(pred[mask], gt[mask])``)."""
    sq = (pred - gt) ** 2
    if mask is None:
        return jnp.mean(sq) if reduction == "mean" else jnp.sum(sq)
    m = mask[..., None].astype(sq.dtype)
    total = jnp.sum(sq * m)
    if reduction == "sum":
        return total
    count = jnp.sum(m) * sq.shape[-1]
    return total / jnp.maximum(count, 1.0)




def loss_loc_2d(ctx: LossContext) -> Optional[jnp.ndarray]:
    """MSE on 2D projections over common joints, with missing-joint masking
    (reference ``loss/loc_2d.py:69-89``). Prefers the transformed
    (normalized) space when available."""
    out_idx, in_idx = get_common_indices(ctx.input_nodes, ctx.output_nodes)
    if ctx.sliced.get("projection_2d_transformed") is not None \
            and ctx.targets.get("projection_2d_transformed") is not None:
        pred = ctx.sliced["projection_2d_transformed"][..., out_idx, 0:2]
        gt = ctx.targets["projection_2d_transformed"][..., in_idx, 0:2]
    elif ctx.sliced.get("projection_2d") is not None \
            and ctx.targets.get("projection_2d") is not None:
        pred = ctx.sliced["projection_2d"][..., out_idx, 0:2]
        gt = ctx.targets["projection_2d"][..., in_idx, 0:2]
    else:
        return None
    mask = None
    if ctx.mask_missing_joints:
        mask = get_missing_joints_mask(
            gt, common_hips_index(ctx.input_nodes, in_idx))
    return _masked_mse(pred, gt, mask)


def loss_loc_3d(ctx: LossContext) -> Optional[jnp.ndarray]:
    """MSE on absolute 3D pose locations (reference ``loss/loc_3d.py:12-40``;
    unmasked, matching upstream)."""
    if ctx.sliced.get("absolute_pose_loc") is None \
            or ctx.targets.get("absolute_pose_loc") is None:
        return None
    out_idx, in_idx = get_common_indices(ctx.input_nodes, ctx.output_nodes)
    pred = ctx.sliced["absolute_pose_loc"][:, :, out_idx]
    gt = ctx.targets["absolute_pose_loc"][:, :, in_idx]
    return _masked_mse(pred, gt, None)


def loss_rot_3d(ctx: LossContext) -> Optional[jnp.ndarray]:
    """MSE on absolute rotation matrices (reference ``loss/rot_3d.py:9-37``)."""
    if ctx.sliced.get("absolute_pose_rot") is None \
            or ctx.targets.get("absolute_pose_rot") is None:
        return None
    out_idx, in_idx = get_common_indices(ctx.input_nodes, ctx.output_nodes)
    pred = ctx.sliced["absolute_pose_rot"][:, :, out_idx]
    gt = ctx.targets["absolute_pose_rot"][:, :, in_idx]
    return jnp.mean((pred - gt) ** 2)


def loss_cum_pose_changes(ctx: LossContext) -> Optional[jnp.ndarray]:
    """MSE on rotation-change matrices *accumulated over frames* (reference
    ``loss/cum_pose_changes.py:9-56``; right-multiplied running product —
    here a single associative scan). Runs on the 9 component planes: this is
    a training hot path, and batched (..., 3, 3) matmuls pad to (8, 128) TPU
    tiles (CLAUDE.md; ops/kinematics.py plane helpers)."""
    import jax

    from ..ops.kinematics import _compose9, _unpack9

    pose_inputs = ctx.sliced.get("pose_inputs")
    if pose_inputs is None or isinstance(pose_inputs, tuple) \
            or ctx.targets.get("pose_changes") is None \
            or pose_inputs.shape[-2:] != (3, 3):
        # absolute_loc/pose_2d outputs are not rotation matrices: the loss is
        # statically unavailable, like the reference's unsupported
        # loss x output-type combos (tests/fixtures/flow.py:27-59 skip matrix)
        return None
    # _compose9(a, b) = b @ a, so swap to keep the earlier-frame @ later-frame
    # (right-multiplied) order of the reference
    compose = lambda a, b: _compose9(b, a)  # noqa: E731
    cum_pred = jax.lax.associative_scan(compose, _unpack9(pose_inputs),
                                        axis=1)
    cum_gt = jax.lax.associative_scan(
        compose, _unpack9(ctx.targets["pose_changes"]), axis=1)
    return sum(jnp.mean((p - g) ** 2)
               for p, g in zip(cum_pred, cum_gt)) / 9.0


def loss_pose_changes(ctx: LossContext) -> Optional[jnp.ndarray]:
    """Sum-reduced MSE directly on change matrices (reference
    ``loss/pose_changes.py:7-28``)."""
    pose_inputs = ctx.sliced.get("pose_inputs")
    if pose_inputs is None or isinstance(pose_inputs, tuple) \
            or ctx.targets.get("pose_changes") is None \
            or pose_inputs.shape[-2:] != (3, 3):
        return None
    return jnp.sum((pose_inputs - ctx.targets["pose_changes"]) ** 2)


def loss_per_joint_loc_2d(ctx: LossContext) -> Optional[jnp.ndarray]:
    """Per-joint weighted sum of 2D MSEs (reference
    ``loss/per_joint_loc_2d.py:7-26``: sum-per-joint with weights from the
    flattened ``--loss_params_{i}`` args)."""
    out_idx, in_idx = get_common_indices(ctx.input_nodes, ctx.output_nodes)
    if ctx.sliced.get("projection_2d_transformed") is not None \
            and ctx.targets.get("projection_2d_transformed") is not None:
        pred = ctx.sliced["projection_2d_transformed"][..., out_idx, 0:2]
        gt = ctx.targets["projection_2d_transformed"][..., in_idx, 0:2]
    elif ctx.sliced.get("projection_2d") is not None \
            and ctx.targets.get("projection_2d") is not None:
        pred = ctx.sliced["projection_2d"][..., out_idx, 0:2]
        gt = ctx.targets["projection_2d"][..., in_idx, 0:2]
    else:
        return None
    mask = None
    if ctx.mask_missing_joints:
        mask = get_missing_joints_mask(
            gt, common_hips_index(ctx.input_nodes, in_idx))

    num_joints = pred.shape[-2]
    if ctx.loss_params is not None:
        # reference ``per_joint_loc_2d.py``: weights are per-INPUT-skeleton
        # node and gathered at the common input indices (which need not be
        # contiguous when skeletons differ) — NOT the first num_joints
        import numpy as _np
        w_full = _np.asarray(list(ctx.loss_params), dtype=float)
        if isinstance(in_idx, slice):
            w_sel = w_full[in_idx]
        else:
            idx = _np.asarray(list(in_idx))
            if len(w_full) <= idx.max():
                raise ValueError(
                    f"--loss_params supplies {len(w_full)} per-joint weights "
                    f"but the input skeleton's common joints reach index "
                    f"{int(idx.max())} — provide one weight per "
                    f"input-skeleton node")
            w_sel = w_full[idx]
        if len(w_sel) != num_joints:
            raise ValueError(
                f"--loss_params resolves to {len(w_sel)} weights for "
                f"{num_joints} common joints")
        weights = jnp.asarray(w_sel, dtype=pred.dtype)
    else:
        weights = jnp.ones((num_joints,), dtype=pred.dtype)

    sq = (pred - gt) ** 2
    batch_axes = tuple(range(sq.ndim - 2)) + (-1,)
    if mask is not None:
        # per-joint mean over unmasked elements only
        m = mask[..., None].astype(sq.dtype)
        counts = jnp.sum(mask.astype(sq.dtype),
                         axis=tuple(range(mask.ndim - 1))) * sq.shape[-1]
        per_joint = jnp.sum(sq * m, axis=batch_axes) / jnp.maximum(counts, 1.0)
    else:
        per_joint = jnp.mean(sq, axis=batch_axes)
    return jnp.sum(per_joint * weights)


def loss_heatmaps(ctx: LossContext) -> Optional[jnp.ndarray]:
    """Sum-per-frame MSE on flattened heatmaps incl. background channel
    (reference ``loss/heatmaps_loss.py:9-47``). Missing joints — all-zero GT
    heatmap channels — are masked out like every BasePoseLoss subclass
    (the reference's ``get_missing_joints_mask`` on the flattened maps);
    without the mask, occluded joints actively train toward zero maps."""
    pred = ctx.sliced.get("heatmaps")
    gt = ctx.targets.get("heatmaps")
    if pred is None or gt is None:
        return None
    sq = (pred - gt) ** 2  # (B, L, C, h, w)
    if ctx.mask_missing_joints:
        present = jnp.any(gt != 0, axis=(-2, -1))  # (B, L, C)
        m = present[..., None, None].astype(sq.dtype)
        hw = sq.shape[-2] * sq.shape[-1]
        counts = jnp.sum(present, axis=-1) * hw  # (B, L) valid elements
        per_frame = jnp.sum(sq * m, axis=tuple(range(2, sq.ndim))) \
            / jnp.maximum(counts, 1.0)
    else:
        per_frame = jnp.mean(sq, axis=tuple(range(2, sq.ndim)))
    return jnp.sum(jnp.mean(per_frame, axis=0))


def _composite(names: Sequence[str], weighted: bool = False):
    def fn(ctx: LossContext) -> Optional[jnp.ndarray]:
        try:
            parts = [ctx.requirements[n] for n in names]
        except KeyError:
            return None
        if weighted:
            return sum(float(ctx.loss_weights.get(n, 1.0)) * p
                       for n, p in zip(names, parts))
        return sum(parts)
    return fn


class LossModes(Enum):
    """(callable, deps) — mirrors reference ``loss/__init__.py:18-53``."""
    loc_2d = (loss_loc_2d, ())
    common_loc_2d = (loss_loc_2d, ())  # deprecated alias kept for CLI parity
    loc_3d = (loss_loc_3d, ())
    rot_3d = (loss_rot_3d, ())
    cum_pose_changes = (loss_cum_pose_changes, ())
    pose_changes = (loss_pose_changes, ())
    loc_2d_3d = (_composite(("loc_2d", "loc_3d")), ("loc_2d", "loc_3d"))
    loc_2d_loc_rot_3d = (_composite(("loc_2d", "loc_3d", "rot_3d")),
                         ("loc_2d", "loc_3d", "rot_3d"))
    weighted_loc_2d_loc_rot_3d = (
        _composite(("loc_2d", "loc_3d", "rot_3d"), weighted=True),
        ("loc_2d", "loc_3d", "rot_3d"))
    loc_rot_3d = (_composite(("loc_3d", "rot_3d")), ("loc_3d", "rot_3d"))
    per_joint_loc_2d = (loss_per_joint_loc_2d, ())
    heatmaps = (loss_heatmaps, ())


def resolve_loss_modes(loss_modes: Sequence) -> List[LossModes]:
    """Prepend dependencies (deduplicated, order-preserving) — reference
    ``base.py:76-93``."""
    requested = [LossModes[m] if isinstance(m, str) else m for m in loss_modes]
    ordered: List[LossModes] = []
    for mode in requested:
        for dep in mode.value[1]:
            ordered.append(LossModes[dep])
        ordered.append(mode)
    return list(dict.fromkeys(ordered))


def calculate_losses(loss_modes: Sequence[LossModes],
                     requested: Sequence[LossModes],
                     ctx: LossContext) -> Dict[str, jnp.ndarray]:
    """Evaluate the resolved loss chain, stopping after the first *requested*
    loss that is statically computable (reference ``base.py:440-469``)."""
    loss_dict: Dict[str, jnp.ndarray] = {}
    for mode in loss_modes:
        fn, deps = mode.value
        ctx.requirements = {k: v for k, v in loss_dict.items() if k in deps}
        value = fn(ctx)
        if value is not None:
            loss_dict[mode.name] = value
            if mode in requested:
                break
    return loss_dict


def primary_loss(loss_dict: Dict[str, jnp.ndarray],
                 requested: Sequence[LossModes]) -> Tuple[str, jnp.ndarray]:
    """First requested loss present in the dict (reference ``base.py:415-438``)."""
    for mode in requested:
        if mode.name in loss_dict:
            return mode.name, loss_dict[mode.name]
    raise RuntimeError("Couldn't calculate any loss.")
