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

        _, abs_loc = _fk_frame(state, rel_loc, num_bones)

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


def _fk_frame(state, rel_loc, num_bones):
    """One frame's FK on component slabs: per-bone lists of (1, B) rows.

    ``state``: 9 planes (26, B) of carried relative rotations; ``rel_loc``:
    3 planes (26, B). Returns (abs_rot, abs_loc) as per-bone row lists —
    parents always precede children in the CARLA DFS order, so a plain
    Python loop visits them in dependency order (no tensor scatter, which
    Mosaic cannot lower)."""
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
    return abs_rot, abs_loc


def _fwd_train_kernel(changes_ref, rel_loc_ref, rel_rot_ref,
                      proj_ref, abs_ref, state_ref, carry_ref,
                      camera_consts):
    """Training forward, one grid step per frame: like :func:`_kernel` but
    additionally writes the absolute pose locations (for the 3D losses) and
    the per-frame carried relative rotations (the backward kernel's
    residuals).

    Gridding over frames (instead of keeping the whole clip in one block)
    keeps per-step VMEM at ~45 (26, B) planes, which lets the batch block
    widen far past 128 lanes — the FK tree walk is a serial dependency
    chain of ~400 small vector ops per frame, so wall time scales with the
    number of chain traversals (batch blocks), not with lanes. The
    across-frame rotation recurrence lives in ``carry_ref``, a VMEM scratch
    that persists across grid steps (frames run innermost, so each batch
    block re-initializes it at t == 0).

    proj_ref:  (1, 3, 26, B)  (x_screen, y_screen, depth), this frame
    abs_ref:   (1, 3, 26, B)  absolute pose locations (P3D pose space)
    state_ref: (1, 9, 26, B)  relative rotations after this frame's compose
    carry_ref: (9, 26, B)     VMEM scratch: the rotation recurrence carry
    """
    from jax.experimental import pallas as pl

    (r00, r01, r02, r10, r11, r12, r20, r21, r22,
     t0, t1, t2, fx, fy, px, py, w, h) = camera_consts

    @pl.when(pl.program_id(1) == 0)
    def _init():
        for i in range(9):
            carry_ref[i] = rel_rot_ref[i]

    rel_loc = [rel_loc_ref[i] for i in range(3)]
    num_bones = rel_loc_ref.shape[1]
    changes = [changes_ref[0, i] for i in range(9)]
    state = list(_compose9_slabs([carry_ref[i] for i in range(9)],
                                 changes))                # C_t @ R_{t-1}
    for i in range(9):
        state_ref[0, i] = state[i]
        carry_ref[i] = state[i]

    abs_rot, abs_loc = _fk_frame(state, rel_loc, num_bones)
    ax = jnp.concatenate([abs_loc[b][0] for b in range(num_bones)], 0)
    ay = jnp.concatenate([abs_loc[b][1] for b in range(num_bones)], 0)
    az = jnp.concatenate([abs_loc[b][2] for b in range(num_bones)], 0)
    abs_ref[0, 0] = ax
    abs_ref[0, 1] = ay
    abs_ref[0, 2] = az

    # p3d pose -> world axis swap (x, y, z) -> (y, -x, z), then view+pinhole
    wx, wy, wz = ay, -ax, az
    vx = wx * r00 + wy * r10 + wz * r20 + t0
    vy = wx * r01 + wy * r11 + wz * r21 + t1
    vz = wx * r02 + wy * r12 + wz * r22 + t2
    inv_z = 1.0 / vz
    proj_ref[0, 0] = w - (fx * vx * inv_z + px)
    proj_ref[0, 1] = h - (fy * vy * inv_z + py)
    proj_ref[0, 2] = vz


def _bwd_train_kernel(changes_ref, rel_loc_ref, rel_rot_ref, state_ref,
                      state_prev_ref, gproj_ref, gabs_ref,
                      dchanges_ref, drel_loc_ref, drel_rot_ref,
                      camera_consts, clip_length):
    """Hand-written reverse-mode of :func:`_fwd_train_kernel`, one grid step
    per frame.

    The grid's inner dimension walks the clip in reverse (index maps flip
    ``t -> L-1-t``; TPU grid steps run sequentially, so this is the exact
    transpose of the forward's frame recurrence). The relative-rotation
    cotangent carried across frames lives in ``drel_rot_ref`` — its index
    map is constant over the frame dimension, so the block stays resident
    in VMEM across the whole inner loop and is flushed once at the end,
    holding exactly ``d rel_rot``; ``drel_loc_ref`` accumulates the same
    way. Per frame: replay FK from the stored ``state`` residual, transpose
    the pinhole+axis-swap chain, then push cotangents down the bone tree in
    reverse DFS order (children before parents — CARLA bone indices are
    topologically sorted, so a reversed Python loop is the exact transpose
    of the forward recursion)."""
    (r00, r01, r02, r10, r11, r12, r20, r21, r22,
     _t0, _t1, _t2, fx, fy, _px, _py, _w, _h) = camera_consts
    from jax.experimental import pallas as pl

    t_rev = pl.program_id(1)                 # 0 .. L-1, frame = L-1-t_rev
    is_first = t_rev == 0                    # frame L-1: zero-init carries
    is_last = t_rev == clip_length - 1       # frame 0: S_prev is rel_rot

    rel_loc = [rel_loc_ref[i] for i in range(3)]
    num_bones = rel_loc_ref.shape[1]
    zero_row = jnp.zeros_like(rel_loc[0][0:1])
    zero_plane = jnp.zeros_like(rel_loc[0])

    @pl.when(is_first)
    def _init():
        for i in range(9):
            drel_rot_ref[i] = zero_plane
        for i in range(3):
            drel_loc_ref[i] = zero_plane

    state = [state_ref[0, i] for i in range(9)]
    abs_rot, abs_loc = _fk_frame(state, rel_loc, num_bones)
    ax = jnp.concatenate([abs_loc[b][0] for b in range(num_bones)], 0)
    ay = jnp.concatenate([abs_loc[b][1] for b in range(num_bones)], 0)
    az = jnp.concatenate([abs_loc[b][2] for b in range(num_bones)], 0)

    # ---- transpose of axis swap + view transform + pinhole ----
    wx, wy, wz = ay, -ax, az
    vx = wx * r00 + wy * r10 + wz * r20 + _t0
    vy = wx * r01 + wy * r11 + wz * r21 + _t1
    vz = wx * r02 + wy * r12 + wz * r22 + _t2
    inv_z = 1.0 / vz
    gx = gproj_ref[0, 0]
    gy = gproj_ref[0, 1]
    gz = gproj_ref[0, 2]
    dvx = -(fx * inv_z) * gx
    dvy = -(fy * inv_z) * gy
    dvz = gz + (fx * vx * gx + fy * vy * gy) * (inv_z * inv_z)
    dwx = r00 * dvx + r01 * dvy + r02 * dvz
    dwy = r10 * dvx + r11 * dvy + r12 * dvz
    dwz = r20 * dvx + r21 * dvy + r22 * dvz
    # (wx, wy, wz) = (ay, -ax, az) => da = (-dwy, dwx, dwz) + g_abs
    dax = gabs_ref[0, 0] - dwy
    day = gabs_ref[0, 1] + dwx
    daz = gabs_ref[0, 2] + dwz

    # ---- transpose of the FK tree (children before parents) ----
    dal = [[dax[b:b + 1], day[b:b + 1], daz[b:b + 1]]
           for b in range(num_bones)]
    dar = [[zero_row] * 9 for _ in range(num_bones)]
    dstate_rows = [None] * num_bones
    dloc_rows = [None] * num_bones
    for b_idx in range(num_bones - 1, 0, -1):
        p_idx = int(PARENTS[b_idx])
        pr = abs_rot[p_idx]
        cr = [state[i][b_idx:b_idx + 1] for i in range(9)]
        cl = [rel_loc[i][b_idx:b_idx + 1] for i in range(3)]
        dal_b = dal[b_idx]
        dar_b = dar[b_idx]
        # abs_loc[b][j] = sum_k cl[k] pr[k,j] + pl[j]
        dloc_rows[b_idx] = [
            pr[k * 3 + 0] * dal_b[0] + pr[k * 3 + 1] * dal_b[1]
            + pr[k * 3 + 2] * dal_b[2] for k in range(3)]
        for j in range(3):
            dal[p_idx][j] = dal[p_idx][j] + dal_b[j]
        # abs_rot[b][i,j] = sum_k cr[i,k] pr[k,j]
        dcr = [sum(dar_b[i * 3 + j] * pr[k * 3 + j] for j in range(3))
               for i in range(3) for k in range(3)]
        dstate_rows[b_idx] = dcr
        dpr = [cl[k] * dal_b[j]
               + sum(cr[i * 3 + k] * dar_b[i * 3 + j] for i in range(3))
               for k in range(3) for j in range(3)]
        dar[p_idx] = [dar[p_idx][i] + dpr[i] for i in range(9)]
    # root: abs_rot[0] = state rows, abs_loc[0] = rel_loc rows
    dstate_rows[0] = dar[0]
    dloc_rows[0] = dal[0]
    for k in range(3):
        drel_loc_ref[k] = drel_loc_ref[k] + jnp.concatenate(
            [dloc_rows[b][k] for b in range(num_bones)], 0)

    # cotangent of this frame's state: FK-tree term + the carry from frame
    # t+1 (resident in drel_rot_ref; zeroed at the first grid step)
    dstate_t = [
        jnp.concatenate([dstate_rows[b][i] for b in range(num_bones)], 0)
        + drel_rot_ref[i]
        for i in range(9)]

    # ---- transpose of state_t = C_t @ S_{t-1} ----
    is_frame0 = jnp.broadcast_to(is_last, zero_plane.shape)
    s_prev = [jnp.where(is_frame0, rel_rot_ref[i], state_prev_ref[0, i])
              for i in range(9)]
    changes = [changes_ref[0, i] for i in range(9)]
    # dC[i,k] = sum_j dS[i,j] S_prev[k,j]
    for i in range(3):
        for k in range(3):
            dchanges_ref[0, i * 3 + k] = (
                dstate_t[i * 3 + 0] * s_prev[k * 3 + 0]
                + dstate_t[i * 3 + 1] * s_prev[k * 3 + 1]
                + dstate_t[i * 3 + 2] * s_prev[k * 3 + 2])
    # dS_prev[k,j] = sum_i C[i,k] dS[i,j] -> becomes the next step's carry;
    # after the final step (frame 0, S_prev = rel_rot) this IS d rel_rot
    for k in range(3):
        for j in range(3):
            drel_rot_ref[k * 3 + j] = (
                changes[0 * 3 + k] * dstate_t[0 * 3 + j]
                + changes[1 * 3 + k] * dstate_t[1 * 3 + j]
                + changes[2 * 3 + k] * dstate_t[2 * 3 + j])


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
    changes_slabs, loc_slabs, rot_slabs, Bp = _prep_slabs(
        pose_changes, rel_loc, rel_rot, block_b)

    grid = (Bp // block_b,)
    out = pl.pallas_call(
        functools.partial(_kernel, camera_consts=_camera_consts(camera)),
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


# ---------------------------------------------------------------------------
# Training kernel: Pallas forward AND Pallas backward.
#
# The forward additionally emits the absolute pose locations (so the 3D
# losses never need the XLA FK chain — it dead-code-eliminates out of the
# train step) and the per-frame carried relative rotations, which are the
# backward kernel's residuals. The backward is the hand-written transpose:
# reverse frame loop carrying the relative-rotation cotangent, FK replay per
# frame from the stored state, reverse-DFS tree transpose.
# ---------------------------------------------------------------------------

def _train_block_b(B):
    """Batch block width for the training kernels. A TPU block-width sweep
    at batch 1024 (PVC_PALLAS_BLOCK_B ∈ {128, 256, 512}) is flat within
    tunnel noise (~645k clips/s each), with 256 posting the best observed
    runs (709k/784k) across sessions — the FK chain's VPU work scales with
    lane count, so widening mostly amortizes grid overhead. 1024 lanes
    overflow the backward's scoped VMEM (~60 resident (26, B) planes) by
    ~32 KB and must not be chosen. Override with PVC_PALLAS_BLOCK_B."""
    import os
    env = os.environ.get("PVC_PALLAS_BLOCK_B")
    if env:
        return int(env)
    if jax.default_backend() != "tpu":
        return max(8, int(np.ceil(B / 8)) * 8)
    Bp = max(BLOCK_B, int(np.ceil(B / BLOCK_B)) * BLOCK_B)
    return 256 if Bp % 256 == 0 else BLOCK_B


def _prep_slabs(pose_changes, rel_loc, rel_rot, block_b):
    """Pad the batch to the block size and build the slab layouts."""
    B, L = pose_changes.shape[:2]
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
    return changes_slabs, loc_slabs, rot_slabs, Bp


def _camera_consts(camera: C.PinholeCamera):
    R = np.asarray(camera.R)
    T = np.asarray(camera.T)
    return tuple(float(v) for v in (
        R[0, 0], R[0, 1], R[0, 2], R[1, 0], R[1, 1], R[1, 2],
        R[2, 0], R[2, 1], R[2, 2], T[0], T[1], T[2],
        camera.focal[0], camera.focal[1],
        camera.principal[0], camera.principal[1],
        camera.image_size[0], camera.image_size[1]))


def _train_fwd_slabs(changes_slabs, loc_slabs, rot_slabs, block_b, camera):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    L, _, J, Bp = changes_slabs.shape
    dt = changes_slabs.dtype
    # grid = (batch blocks, frames): per-frame blocks keep VMEM small
    # enough for wide batch blocks; the rotation carry lives in scratch
    grid = (Bp // block_b, L)

    def frame_spec(c):
        return pl.BlockSpec((1, c, J, block_b), lambda i, t: (t, 0, 0, i),
                            memory_space=pltpu.VMEM)

    def const_spec(c):
        return pl.BlockSpec((c, J, block_b), lambda i, t: (0, 0, i),
                            memory_space=pltpu.VMEM)

    proj, abs_loc, states = pl.pallas_call(
        functools.partial(_fwd_train_kernel,
                          camera_consts=_camera_consts(camera)),
        out_shape=(jax.ShapeDtypeStruct((L, 3, J, Bp), dt),
                   jax.ShapeDtypeStruct((L, 3, J, Bp), dt),
                   jax.ShapeDtypeStruct((L, 9, J, Bp), dt)),
        grid=grid,
        in_specs=[frame_spec(9), const_spec(3), const_spec(9)],
        out_specs=(frame_spec(3), frame_spec(3), frame_spec(9)),
        scratch_shapes=[pltpu.VMEM((9, J, block_b), dt)],
        interpret=jax.default_backend() != "tpu",
    )(changes_slabs, loc_slabs, rot_slabs)
    return proj, abs_loc, states


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_projection_train(pose_changes, rel_loc, rel_rot,
                           camera: C.PinholeCamera):
    """Trainable fused FK+projection: Pallas forward *and* backward.

    :param pose_changes: (B, L, 26, 3, 3); :param rel_loc: (B, 26, 3);
    :param rel_rot: (B, 26, 3, 3)
    :return: ``(projections (B, L, 26, 3), abs_loc (B, L, 26, 3))`` — the
        screen projections and the absolute pose locations (P3D pose
        space), i.e. both tensors the 2D+3D loss stack consumes, so the
        XLA FK path dead-code-eliminates out of the train step entirely.
    """
    (proj, abs_loc), _ = _train_fwd(pose_changes, rel_loc, rel_rot, camera)
    return proj, abs_loc


def _train_fwd(pose_changes, rel_loc, rel_rot, camera):
    B = pose_changes.shape[0]
    block_b = _train_block_b(B)
    changes_slabs, loc_slabs, rot_slabs, _ = _prep_slabs(
        pose_changes, rel_loc, rel_rot, block_b)
    proj, abs_loc, states = _train_fwd_slabs(
        changes_slabs, loc_slabs, rot_slabs, block_b, camera)
    out = (jnp.transpose(proj, (3, 0, 2, 1))[:B],
           jnp.transpose(abs_loc, (3, 0, 2, 1))[:B])
    return out, (changes_slabs, loc_slabs, rot_slabs, states, block_b, B)


def _train_bwd(camera, residuals, g):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    changes_slabs, loc_slabs, rot_slabs, states, block_b, B = residuals
    g_proj, g_abs = g
    L, _, J, Bp = changes_slabs.shape
    dt = changes_slabs.dtype

    def _g_slabs(t):
        t = t.astype(dt)
        if Bp != B:
            t = jnp.concatenate(
                [t, jnp.zeros((Bp - B,) + t.shape[1:], dt)], 0)
        return jnp.transpose(t, (1, 3, 2, 0))              # (L, 3, 26, Bp)

    # grid = (batch blocks, frames): the inner frame dimension runs the
    # clip in REVERSE (index maps flip t -> L-1-t; TPU grid steps execute
    # sequentially in order) with one frame's slabs resident per step —
    # a monolithic whole-clip block overflows the 16 MB scoped VMEM at
    # 128 lanes, and per-frame blocks pipeline the HBM copies besides.
    grid = (Bp // block_b, L)

    def frame_spec(c):      # per-frame slab, reverse order
        return pl.BlockSpec((1, c, J, block_b),
                            lambda i, t: (L - 1 - t, 0, 0, i),
                            memory_space=pltpu.VMEM)

    def frame_prev_spec(c):  # previous frame's slab (clamped at frame 0)
        return pl.BlockSpec((1, c, J, block_b),
                            lambda i, t: (jnp.maximum(L - 2 - t, 0), 0, 0, i),
                            memory_space=pltpu.VMEM)

    def const_spec(c):      # constant over frames -> resident across t
        return pl.BlockSpec((c, J, block_b), lambda i, t: (0, 0, i),
                            memory_space=pltpu.VMEM)

    d_changes, d_loc, d_rot = pl.pallas_call(
        functools.partial(_bwd_train_kernel,
                          camera_consts=_camera_consts(camera),
                          clip_length=L),
        out_shape=(jax.ShapeDtypeStruct((L, 9, J, Bp), dt),
                   jax.ShapeDtypeStruct((3, J, Bp), dt),
                   jax.ShapeDtypeStruct((9, J, Bp), dt)),
        grid=grid,
        in_specs=[frame_spec(9), const_spec(3), const_spec(9),
                  frame_spec(9), frame_prev_spec(9),
                  frame_spec(3), frame_spec(3)],
        out_specs=(frame_spec(9), const_spec(3), const_spec(9)),
        interpret=jax.default_backend() != "tpu",
    )(changes_slabs, loc_slabs, rot_slabs, states, states,
      _g_slabs(g_proj), _g_slabs(g_abs))

    # slabs -> caller layouts, padded block sliced away
    d_pose_changes = jnp.transpose(
        d_changes, (3, 0, 2, 1))[:B].reshape(B, L, J, 3, 3)
    d_rel_loc = jnp.transpose(d_loc, (2, 1, 0))[:B]
    d_rel_rot = jnp.transpose(d_rot, (2, 1, 0))[:B].reshape(B, J, 3, 3)
    return d_pose_changes, d_rel_loc, d_rel_rot


fused_projection_train.defvjp(_train_fwd, _train_bwd)
