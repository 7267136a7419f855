"""Fused pose-changes -> FK -> camera-projection Pallas TPU kernel.

This is the reference's hot loop stack (``p3d_pose.py:116-149`` recursion +
``projection.py:107-195`` per-frame loops) as ONE kernel invocation per batch
block: the whole clip stays resident in VMEM, the across-frame rotation
recurrence runs sequentially in-register, and nothing round-trips to HBM
between the stages.

Layout: batch (clips) rides the 128-lane axis. Rotations are
``(9, 26, B_block)`` component slabs, locations ``(3, 26, B_block)`` — every
3x3 composition is 27 fused multiply-adds over well-tiled (26, B) planes (the
same component-plane algebra as the XLA path in ``ops/kinematics.py``, which
serves as both the numerical reference and the custom-VJP backward).

``fused_projection`` is the public entry: Pallas forward on TPU with an XLA
backward; plain XLA everywhere else (CPU tests run the kernel via
``interpret=True`` for equivalence).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np

from ...skeletons.carla import PARENTS
from .. import camera as C
from .. import kinematics as K

BLOCK_B = 128


def _compose9_slabs(a, b):
    """Row-vector ``b @ a`` on (9, 26, B) component slabs."""
    rows = []
    for i in range(3):
        for j in range(3):
            rows.append(b[i * 3 + 0] * a[0 + j]
                        + b[i * 3 + 1] * a[3 + j]
                        + b[i * 3 + 2] * a[6 + j])
    return jnp.stack(rows, axis=0)


def _kernel(changes_ref, rel_loc_ref, rel_rot_ref, out_ref, camera_consts):
    """One batch block: loop frames, carry relative rotations.

    changes_ref: (L, 9, 26, B)   rotation-change slabs per frame
    rel_loc_ref: (3, 26, B)      reference relative locations
    rel_rot_ref: (9, 26, B)      initial relative rotations
    out_ref:     (L, 3, 26, B)   (x_screen, y_screen, depth)
    """
    L = changes_ref.shape[0]
    (r00, r01, r02, r10, r11, r12, r20, r21, r22,
     t0, t1, t2, fx, fy, px, py, w, h) = camera_consts

    rel_loc = [rel_loc_ref[i] for i in range(3)]          # 3 x (26, B)
    state = [rel_rot_ref[i] for i in range(9)]            # 9 x (26, B)

    num_bones = rel_loc_ref.shape[1]
    for t in range(L):
        changes = [changes_ref[t, i] for i in range(9)]
        state = list(_compose9_slabs(state, changes))     # C_t @ R_{t-1}

        # FK bone by bone in DFS order (parents always precede children), so
        # absolute transforms live in per-bone Python lists of (1, B) rows —
        # no tensor scatter, which Mosaic cannot lower.
        abs_rot = [None] * num_bones
        abs_loc = [None] * num_bones
        abs_rot[0] = [state[i][0:1] for i in range(9)]
        abs_loc[0] = [rel_loc[i][0:1] for i in range(3)]
        for b_idx in range(1, num_bones):
            p_idx = int(PARENTS[b_idx])
            pr = abs_rot[p_idx]
            pl = abs_loc[p_idx]
            cr = [state[i][b_idx:b_idx + 1] for i in range(9)]
            cl = [rel_loc[i][b_idx:b_idx + 1] for i in range(3)]
            abs_rot[b_idx] = [
                cr[i * 3 + 0] * pr[0 + j] + cr[i * 3 + 1] * pr[3 + j]
                + cr[i * 3 + 2] * pr[6 + j]
                for i in range(3) for j in range(3)]
            abs_loc[b_idx] = [
                cl[0] * pr[j] + cl[1] * pr[3 + j] + cl[2] * pr[6 + j]
                + pl[j] for j in range(3)]

        # reassemble (26, B) planes from the per-bone rows
        ax = jnp.concatenate([abs_loc[b][0] for b in range(num_bones)], 0)
        ay = jnp.concatenate([abs_loc[b][1] for b in range(num_bones)], 0)
        az = jnp.concatenate([abs_loc[b][2] for b in range(num_bones)], 0)

        # p3d pose -> world axis swap: (x, y, z) -> (y, -x, z)
        wx, wy, wz = ay, -ax, az
        # camera view transform + pinhole
        vx = wx * r00 + wy * r10 + wz * r20 + t0
        vy = wx * r01 + wy * r11 + wz * r21 + t1
        vz = wx * r02 + wy * r12 + wz * r22 + t2
        inv_z = 1.0 / vz
        out_ref[t, 0] = w - (fx * vx * inv_z + px)
        out_ref[t, 1] = h - (fy * vy * inv_z + py)
        out_ref[t, 2] = vz


def _to_slabs_rot(rot):
    """(B, L, 26, 3, 3) -> (L, 9, 26, B)"""
    return jnp.transpose(
        rot.reshape(rot.shape[:-2] + (9,)), (1, 3, 2, 0))


def fused_projection_pallas(pose_changes: jnp.ndarray,
                            rel_loc: jnp.ndarray,
                            rel_rot: jnp.ndarray,
                            camera: C.PinholeCamera) -> jnp.ndarray:
    """Forward-only Pallas implementation.

    :param pose_changes: (B, L, 26, 3, 3)
    :param rel_loc: (B, 26, 3); :param rel_rot: (B, 26, 3, 3)
    :return: projections (B, L, 26, 3)
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L = pose_changes.shape[:2]
    # off-TPU the kernel runs in interpret mode (pure-python per-op eval),
    # where padding tiny test batches up to the 128-lane block is ~16x
    # wasted work — shrink the block to the padded batch there. On TPU the
    # 128-lane block is required for full-width VPU lanes.
    block_b = BLOCK_B if jax.default_backend() == "tpu" \
        else max(8, int(np.ceil(B / 8)) * 8)
    pad = (-B) % block_b
    if pad:
        pose_changes = jnp.concatenate(
            [pose_changes, jnp.broadcast_to(
                jnp.eye(3, dtype=pose_changes.dtype),
                (pad, L, 26, 3, 3))], axis=0)
        rel_loc = jnp.concatenate([rel_loc, rel_loc[:1].repeat(pad, 0)], 0)
        rel_rot = jnp.concatenate([rel_rot, rel_rot[:1].repeat(pad, 0)], 0)
    Bp = B + pad

    changes_slabs = _to_slabs_rot(pose_changes)            # (L, 9, 26, Bp)
    rot_slabs = jnp.transpose(
        rel_rot.reshape(Bp, 26, 9), (2, 1, 0))             # (9, 26, Bp)
    loc_slabs = jnp.transpose(rel_loc, (2, 1, 0))          # (3, 26, Bp)

    R = np.asarray(camera.R)
    T = np.asarray(camera.T)
    consts = tuple(float(v) for v in (
        R[0, 0], R[0, 1], R[0, 2], R[1, 0], R[1, 1], R[1, 2],
        R[2, 0], R[2, 1], R[2, 2], T[0], T[1], T[2],
        camera.focal[0], camera.focal[1],
        camera.principal[0], camera.principal[1],
        camera.image_size[0], camera.image_size[1]))

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        functools.partial(_kernel, camera_consts=consts),
        out_shape=jax.ShapeDtypeStruct((L, 3, 26, Bp), pose_changes.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((L, 9, 26, block_b),
                         lambda i: (0, 0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, 26, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, 26, block_b), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((L, 3, 26, block_b),
                               lambda i: (0, 0, 0, i),
                               memory_space=pltpu.VMEM),
        interpret=jax.default_backend() != "tpu",
    )(changes_slabs, loc_slabs, rot_slabs)

    # (L, 3, 26, Bp) -> (B, L, 26, 3)
    return jnp.transpose(out, (3, 0, 2, 1))[:B]


def fused_projection_reference(pose_changes, rel_loc, rel_rot,
                               camera: C.PinholeCamera) -> jnp.ndarray:
    """The XLA component-plane path (numerical reference + backward)."""
    _, abs_loc, _ = K.relative_pose_over_clip(pose_changes, rel_loc, rel_rot)
    return C.project_pose(camera, abs_loc)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_projection(pose_changes, rel_loc, rel_rot,
                     camera: C.PinholeCamera) -> jnp.ndarray:
    """Pallas forward + XLA backward fused projection."""
    return fused_projection_pallas(pose_changes, rel_loc, rel_rot, camera)


def _fwd(pose_changes, rel_loc, rel_rot, camera):
    out = fused_projection_pallas(pose_changes, rel_loc, rel_rot, camera)
    return out, (pose_changes, rel_loc, rel_rot)


def _bwd(camera, residuals, g):
    pose_changes, rel_loc, rel_rot = residuals
    _, vjp = jax.vjp(
        lambda c, l, r: fused_projection_reference(c, l, r, camera),
        pose_changes, rel_loc, rel_rot)
    return vjp(g)


fused_projection.defvjp(_fwd, _bwd)
