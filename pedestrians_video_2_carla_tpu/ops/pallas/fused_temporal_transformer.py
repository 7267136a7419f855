"""Fused transformer *block* as one Pallas TPU kernel — built for
PoseFormer's temporal stage (rf=9 window tokens of frame_dim=832).

Why: after the fused spatial kernel, the temporal stack dominates the B1024
bf16 train step (slope-timed ~54 ms fwd / ~166 ms fwd+bwd of a ~184 ms
step). A stage decomposition (tools/temporal_stage_probe.py + /tmp probes on
the real chip) shows the matmuls are already at the MXU floor (13.9 ms fwd /
48.9 fwd+bwd) — the other ~70% is (a) the 9-token attention whose
(B*W, H, 9, 9) score tensors pad 9 -> 128 lanes (~14x bytes; 19.3 ms fwd /
53 ms fwd+bwd for near-zero FLOPs) and (b) LayerNorm/reshape relayout glue
between every op (~21 ms fwd). XLA-level reformulations (token padding to 16,
flat rank-2 activations) both LOSE — the fix needs attention computed in a
batch-in-lanes layout and the glue fused, i.e. this kernel.

Design: ONE pallas_call per transformer block (depth calls per stage) on
feature-major (D, T, BB) slabs with the window/batch dim in lanes. Unlike the
spatial kernel (whole stack in one call), per-block calls keep VMEM bounded:
the temporal weights are ~11 MB/block bf16 and the backward's fp32 weight-
gradient accumulators another ~22 MB/block, so a whole-stack kernel would
not fit; inter-block activations round-trip HBM once per block (~0.3 ms each,
negligible). Attention runs LANE-SLICED on the VPU: with windows in lanes,
lane index = token*BB + window, so every per-token operand is a free 128-lane
column slice of the 2-D (3D, T*BB) slab; the wrapper pre-permutes the qkv
columns / proj rows from (head, dim) to (dim, head) order (plain gathers
outside the kernel, so autodiff handles their transpose) so the per-head
reduction is a free sublane regroup ``(D, BB) -> (HD, H, BB)`` + leading sum
and each (q, k) score tile is exactly one (H=8, BB=128) vreg — zero
relayouts (a head-batched rank-4 formulation paid 3*HD lane->sublane
relayouts per grid step and ran 1.6x slower end-to-end; see
``_probs_lanes``). The backward recomputes block intermediates in VMEM
(flash-style) and accumulates weight grads across sequential grid steps,
exactly like the spatial kernel's.

Math parity: exactly the flax ``_Block`` in ``models/movements/pose_former.py``
(LayerNorm eps 1e-5 with fp32 stats, erf-gelu, fp32 softmax); block fwd/bwd
and LN/gelu/dense primitives are SHARED with
``ops/pallas/fused_spatial_transformer.py`` — only the attention inner loop
differs. Dropout is not implemented — gate at the caller.

Reference: the reimplemented third-party PoseFormer (upstream
``pose_former.py:17-138``) has no TPU analogue; this is the TPU-native
temporal-stage replacement.
"""
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fused_spatial_transformer import (LN_EPS, _block_fwd, _dense, _dgelu,
                                        _gelu, _ln_bwd, _ln_fwd, _prep,
                                        _w_spec, _x_spec)

#: windows per grid step (lane width). r4: the backward halves stream every
#: slab-sized intermediate through explicit VMEM scratch (see the kernel
#: docstrings), which removed the ~80 MB of register spill slots that
#: previously kept the attention half at 128 — both halves now run the
#: forward's 256 width.
BLOCK_N_FWD = int(os.environ.get("PVC_TEMPORAL_BLOCK_FWD", 256))
BLOCK_N_BWD = int(os.environ.get("PVC_TEMPORAL_BLOCK_BWD", 256))
#: the two backward halves are separate pallas calls with different VMEM
#: live sets, so they take independent widths
BLOCK_N_BWD_MLP = int(os.environ.get("PVC_TEMPORAL_BLOCK_BWD_MLP",
                                     BLOCK_N_BWD))
BLOCK_N_BWD_ATTN = int(os.environ.get("PVC_TEMPORAL_BLOCK_BWD_ATTN",
                                      BLOCK_N_BWD))

#: per-block weight-tuple layout (all single-depth, flat):
#: (ln1_s (D,), ln1_b (D,), qkv_w (D,3D), qkv_b (3D,), proj_w (D,D),
#:  proj_b (D,), ln2_s (D,), ln2_b (D,), fc1_w (D,MLP), fc1_b (MLP,),
#:  fc2_w (MLP,D), fc2_b (D,))
NUM_WEIGHTS = 12


def _head_interleave_perm(dim, num_heads):
    """Permutation taking (head, dim)-ordered features to (dim, head) order:
    new row d*H + h = old row h*HD + d."""
    hd = dim // num_heads
    return (np.arange(num_heads)[None, :] * hd
            + np.arange(hd)[:, None]).reshape(-1)


def _probs_lanes(qkv, num_heads, T, BB):
    """Softmax probabilities as a (T, T) nest of one-vreg (H, BB) fp32
    tiles, computed entirely in lane-sliced form: every operand is a FREE
    lane slice of the 2-D (3D, T*BB) slab (lane index = t*BB + bb), the
    per-pair head reduction is a sublane regroup ``(D, BB) -> (HD, H, BB)``
    + leading-axis sum, and the softmax runs tile-wise. No (X, T, BB)
    rank-3 unflattens anywhere — the previous head-batched formulation
    re-laid out three (H, T*BB) -> (H, T, BB) tensors per head-dim per grid
    step (3*HD lane->sublane relayouts), which dominated the kernel's
    non-matmul time."""
    D = qkv.shape[0] // 3
    H = num_heads
    HD = D // H
    scale = float(HD) ** -0.5
    f32 = jnp.float32

    probs = []
    for tq in range(T):
        qs = qkv[:D, tq * BB:(tq + 1) * BB].astype(f32) * scale
        row = []
        for tk in range(T):
            prod = qs * qkv[D:2 * D, tk * BB:(tk + 1) * BB].astype(f32)
            row.append(jnp.sum(prod.reshape(HD, H, BB), axis=0))  # (H, BB)
        m = functools.reduce(jnp.maximum, row)
        e = [jnp.exp(s - m) for s in row]
        inv = 1.0 / functools.reduce(jnp.add, e)
        probs.append([ei * inv for ei in e])
    return probs


def _attn_fwd_hb(qkv, num_heads, T, BB, o_ref=None, probs=None):
    """Head-batched attention on a (3D, T*BB) slab whose q/k/v rows are
    (dim, head)-interleaved (row = d*H + h, so the head axis is a sublane
    regroup). Returns (o (D, T*BB), None); all work is lane-sliced (see
    :func:`_probs_lanes`). ``o_ref``: optional (D, T*BB) VMEM scratch —
    output columns are written imperatively so Mosaic's register allocator
    never holds T slab-sized columns live at once. ``probs``: optional
    precomputed :func:`_probs_lanes` output (the attention backward shares
    one probs computation between its fwd recompute and the grad pass)."""
    D = qkv.shape[0] // 3
    H = num_heads
    HD = D // H
    if probs is None:
        probs = _probs_lanes(qkv, num_heads, T, BB)
    f32 = jnp.float32
    cols = []
    for tq in range(T):
        acc = None
        for tk in range(T):
            vt = qkv[2 * D:, tk * BB:(tk + 1) * BB].astype(f32)
            contrib = vt.reshape(HD, H, BB) * probs[tq][tk][None]
            acc = contrib if acc is None else acc + contrib
        col = acc.reshape(D, BB)
        if o_ref is None:
            cols.append(col)
        else:
            o_ref[:, tq * BB:(tq + 1) * BB] = col.astype(o_ref.dtype)
    if o_ref is None:
        return jnp.concatenate(cols, axis=1), None
    return o_ref[:].astype(f32), None


def _attn_bwd_stream(do, qkv, num_heads, T, BB, consume, probs=None):
    """Reverse of :func:`_attn_fwd_hb` in STREAMING column form: do
    (D, T*BB) fp32; per token t the (3D, BB) gradient column
    [dq_t; dk_t; dv_t] is built and handed to ``consume(t, dqkv_col)``
    immediately, so at most ONE big column is live at a time (holding all
    3T columns cost ~80 MB of register spills at 256 windows/step). Only
    the small (H, BB) softmax/score tiles (probs, dp, ds) stay resident.
    Probabilities are recomputed tile-wise unless ``probs`` is given."""
    D = qkv.shape[0] // 3
    H = num_heads
    HD = D // H
    scale = float(HD) ** -0.5
    f32 = jnp.float32
    if probs is None:
        probs = _probs_lanes(qkv, num_heads, T, BB)

    def h3(x):  # (D, BB) -> (HD, H, BB) sublane regroup (free)
        return x.reshape(HD, H, BB)

    def lane(base, t):
        return qkv[base:base + D, t * BB:(t + 1) * BB].astype(f32)

    def do_col(t):
        return do[:, t * BB:(t + 1) * BB]

    # small (H, BB) tiles: dp, then softmax backward ds
    dp = [[jnp.sum(h3(do_col(tq) * lane(2 * D, tk)), axis=0)
           for tk in range(T)] for tq in range(T)]
    ds = [None] * T
    for tq in range(T):
        c = functools.reduce(jnp.add,
                             (dp[tq][tk] * probs[tq][tk] for tk in range(T)))
        ds[tq] = [probs[tq][tk] * (dp[tq][tk] - c) for tk in range(T)]

    for t in range(T):
        dq = functools.reduce(jnp.add, (h3(lane(D, tk)) * ds[t][tk][None]
                                        for tk in range(T)))
        dk = functools.reduce(jnp.add, (h3(lane(0, tq)) * ds[tq][t][None]
                                        for tq in range(T)))
        dv = functools.reduce(jnp.add, (h3(do_col(tq)) * probs[tq][t][None]
                                        for tq in range(T)))
        consume(t, jnp.concatenate(
            [dq.reshape(D, BB) * scale, dk.reshape(D, BB) * scale,
             dv.reshape(D, BB)], axis=0))


def _attn_bwd_hb(do, qkv, num_heads, T, BB, probs=None):
    """Materialized (3D, T*BB) gradient from :func:`_attn_bwd_stream`
    (numerical oracle / interpret-mode convenience)."""
    cols = [None] * T

    def consume(t, col):
        cols[t] = col

    _attn_bwd_stream(do, qkv, num_heads, T, BB, consume, probs=probs)
    D = qkv.shape[0] // 3
    return jnp.concatenate(
        [jnp.concatenate([c[i * D:(i + 1) * D] for c in cols], axis=1)
         for i in range(3)], axis=0)


def _lift(wp):
    """1-D biases/scales -> (1, n): Mosaic block refs stay >= 2-D (the
    proven spatial-kernel pattern, where depth stacking did this for free)."""
    return tuple(w if w.ndim > 1 else w[None] for w in wp)


def _wd_from(w_refs):
    """Per-block weight dict from LIFTED (>= 2-D) refs/arrays."""
    f = jnp.float32
    (ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
     ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b) = w_refs
    return dict(
        ln1_s=jnp.reshape(ln1_s[0].astype(f), (-1, 1)),
        ln1_b=jnp.reshape(ln1_b[0].astype(f), (-1, 1)),
        qkv_w=qkv_w[:], qkv_b=qkv_b[0],
        proj_w=proj_w[:], proj_b=proj_b[0],
        ln2_s=jnp.reshape(ln2_s[0].astype(f), (-1, 1)),
        ln2_b=jnp.reshape(ln2_b[0].astype(f), (-1, 1)),
        fc1_w=fc1_w[:], fc1_b=fc1_b[0],
        fc2_w=fc2_w[:], fc2_b=fc2_b[0])


def _wd_attn(w_refs):
    """Attention-half weight dict from LIFTED refs (ln1, qkv, proj)."""
    f = jnp.float32
    ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b = w_refs
    return dict(
        ln1_s=jnp.reshape(ln1_s[0].astype(f), (-1, 1)),
        ln1_b=jnp.reshape(ln1_b[0].astype(f), (-1, 1)),
        qkv_w=qkv_w[:], qkv_b=qkv_b[0],
        proj_w=proj_w[:], proj_b=proj_b[0])


def _wd_mlp(w_refs):
    """MLP-half weight dict from LIFTED refs (ln2, fc1, fc2)."""
    f = jnp.float32
    ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b = w_refs
    return dict(
        ln2_s=jnp.reshape(ln2_s[0].astype(f), (-1, 1)),
        ln2_b=jnp.reshape(ln2_b[0].astype(f), (-1, 1)),
        fc1_w=fc1_w[:], fc1_b=fc1_b[0],
        fc2_w=fc2_w[:], fc2_b=fc2_b[0])


def _dots(cdtype):
    """Backward dot helpers on compute-dtype operands, fp32 accumulate
    (full-rate MXU under bf16 AMP — the temporal stage is matmul-bound)."""

    def dot_dx(w, g):       # (in, out) x (out, M) -> (in, M)
        return jax.lax.dot_general(w.astype(cdtype), g.astype(cdtype),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def dot_dw(act, g):     # (in, M) x (out, M) -> (in, out)
        return jax.lax.dot_general(act.astype(cdtype), g.astype(cdtype),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    return dot_dx, dot_dw


def _attn_half_fwd(x, wd, num_heads, T, BB, cdtype, o_ref=None,
                   want_probs=False):
    """x (D, M) fp32 -> (x2 fp32, residuals (xh1, inv1, y1, qkv3, o[, probs])).
    ``want_probs`` appends the softmax tiles to the residuals so the
    backward kernel computes :func:`_probs_lanes` exactly once."""
    xh1, inv1, y1 = _ln_fwd(x, wd["ln1_s"], wd["ln1_b"])
    qkv = _dense(wd["qkv_w"], wd["qkv_b"], y1, cdtype)   # (3D, M) 2-D
    # residuals held in the compute dtype: they are only ever dot operands
    # (cast to cdtype anyway) or re-upcast pointwise — halves the backward
    # kernel's live VMEM under bf16 AMP
    qkv = qkv.astype(cdtype)
    probs = _probs_lanes(qkv, num_heads, T, BB)
    o, _ = _attn_fwd_hb(qkv, num_heads, T, BB, o_ref=o_ref, probs=probs)
    a = _dense(wd["proj_w"], wd["proj_b"], o, cdtype)
    res = (xh1, inv1, y1.astype(cdtype), qkv, o)
    if want_probs:
        res = res + (probs,)
    return x + a, res


def _mlp_half_fwd(x2, wd, cdtype):
    """x2 (D, M) fp32 -> (x3 fp32, residuals (xh2, inv2, y2, h, g))."""
    xh2, inv2, y2 = _ln_fwd(x2, wd["ln2_s"], wd["ln2_b"])
    h = _dense(wd["fc1_w"], wd["fc1_b"], y2, cdtype)
    g = _gelu(h)
    u = _dense(wd["fc2_w"], wd["fc2_b"], g, cdtype)
    return x2 + u, (xh2, inv2, y2.astype(cdtype), h.astype(cdtype),
                    g.astype(cdtype))


def _fwd_kernel(x_ref, *refs, num_heads, save_x2):
    w_refs = refs[:NUM_WEIGHTS]
    out_ref = refs[NUM_WEIGHTS]
    x2_ref = refs[NUM_WEIGHTS + 1] if save_x2 else None
    o_scr = refs[-1]
    D, T, BB = x_ref.shape
    cdtype = x_ref.dtype
    x = x_ref[:].reshape(D, T * BB).astype(jnp.float32)
    x2, _ = _attn_half_fwd(x, _wd_attn(w_refs[:6]), num_heads, T, BB,
                           cdtype, o_ref=o_scr)
    if save_x2:
        x2_ref[:] = x2.astype(cdtype).reshape(D, T, BB)
    y, _ = _mlp_half_fwd(x2, _wd_mlp(w_refs[6:]), cdtype)
    out_ref[:] = y.astype(cdtype).reshape(D, T, BB)


def _flush_dw(dw_refs, order, dW):
    """Accumulate this grid step's weight-grad contributions into the
    constant-index-map output refs (running sums across sequential grid
    steps; initialized at program 0)."""
    for wi, name in enumerate(order):
        contrib = dW[name].astype(dw_refs[wi].dtype)
        if contrib.ndim < dw_refs[wi].ndim:   # lifted 1-D bias/scale grads
            contrib = contrib[None]
        dw_refs[wi][...] += contrib


def _acc(a, b):
    return b if a is None else a + b


def _ln_col_fwd(x, s, b):
    """Per-column LayerNorm recompute that also returns the (mu, inv)
    stats, so the LN-backward loop can rebuild xh from the input ref
    instead of keeping slab-sized xh values live (column streaming)."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=0, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xh = (x - mu) * inv
    return mu, inv, xh, xh * s + b


def _bwd_mlp_kernel(x2_ref, *refs, num_heads):
    """Backward of the MLP half: (x2, g) -> (dx2, dW_mlp).

    COLUMN-STREAMING dataflow (r4): the r3 version recomputed the half on
    the full (D, T*BB) slab and kept every intermediate (xh2, y2, h, g,
    du, dgl, dh, dy2) live as SSA values alongside two fp32 weight-grad
    accumulators — Mosaic's register allocator turned those into ~80 MB of
    slab-sized spill slots and pinned the backward pool at ~32% MFU vs the
    forward's 68% (docs/PERFORMANCE.md "r3 update"). Now each token column
    is recomputed and back-propagated independently (LayerNorm stats are
    per-column, so the MLP half has no cross-token dependency at all); the
    only slab-sized buffers are three explicit VMEM scratch slabs (y2, g,
    dh in the compute dtype) that feed the two per-grid-step weight-grad
    matmuls. Live register footprint drops from O(slab) to O(column)."""
    del num_heads
    w_refs = refs[:6]
    g_ref = refs[6]
    dx2_ref = refs[7]
    dw_refs = refs[8:14]
    y2_scr, g_scr, dh_scr = refs[14:]
    D, T, BB = x2_ref.shape
    cdtype = x2_ref.dtype
    dot_dx, dot_dw = _dots(cdtype)
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dw_refs:
            ref[...] = jnp.zeros_like(ref)

    wd = _wd_mlp(w_refs)
    dln2_s = dln2_b = dfc1_b = dfc2_b = None
    for t in range(T):
        sl = slice(t * BB, (t + 1) * BB)
        x2 = x2_ref[:, t, :].astype(f32)
        _, inv2, xh2, y2 = _ln_col_fwd(x2, wd["ln2_s"], wd["ln2_b"])
        y2_scr[:, sl] = y2.astype(cdtype)
        h = _dense(wd["fc1_w"], wd["fc1_b"], y2.astype(cdtype), cdtype)
        g_scr[:, sl] = _gelu(h).astype(cdtype)
        du = g_ref[:, t, :].astype(f32)
        dgl = dot_dx(wd["fc2_w"], du)
        dh = dgl * _dgelu(h)
        dh_scr[:, sl] = dh.astype(cdtype)
        dy2 = dot_dx(wd["fc1_w"], dh.astype(cdtype))
        dln2_s = _acc(dln2_s, jnp.sum(dy2 * xh2, axis=1))
        dln2_b = _acc(dln2_b, jnp.sum(dy2, axis=1))
        dfc1_b = _acc(dfc1_b, jnp.sum(dh, axis=1))
        dfc2_b = _acc(dfc2_b, jnp.sum(du, axis=1))
        dx2_ref[:, t, :] = (du + _ln_bwd(dy2, xh2, inv2, wd["ln2_s"])
                            ).astype(cdtype)

    du_slab = g_ref[:].reshape(D, T * BB)
    dW = {"ln2_s": dln2_s, "ln2_b": dln2_b,
          "fc1_w": dot_dw(y2_scr[:], dh_scr[:]), "fc1_b": dfc1_b,
          "fc2_w": dot_dw(g_scr[:], du_slab), "fc2_b": dfc2_b}
    _flush_dw(dw_refs, ("ln2_s", "ln2_b", "fc1_w", "fc1_b",
                        "fc2_w", "fc2_b"), dW)


def _bwd_attn_kernel(x_ref, *refs, num_heads):
    """Backward of the attention half: (x, dx2) -> (dx, dW_attn).

    COLUMN-STREAMING dataflow (r4, same rationale as
    :func:`_bwd_mlp_kernel`): every slab-sized intermediate lives in an
    explicit VMEM scratch buffer (y1, qkv, o, do, dqkv) produced/consumed
    one token column at a time — the r3 version held the recompute slabs,
    do/da, AND an fp32 qkv weight-grad accumulator live as SSA values,
    which spilled ~80 MB of vregs and kept this half from compiling at the
    forward's 256-window grid width. The cross-token attention math
    (:func:`_probs_lanes` / :func:`_attn_bwd_stream`) reads the scratch
    REFS directly (free lane slices); the three weight-grad matmuls (qkv,
    proj) run once per grid step on the streamed slabs, and the LN
    backward rebuilds xh columns from the input ref + saved (mu, inv)
    stats instead of keeping the xh slab live."""
    w_refs = refs[:6]
    g_ref = refs[6]
    dx_ref = refs[7]
    dw_refs = refs[8:14]
    y1_scr, qkv_scr, o_scr, do_scr, dqkv_scr = refs[14:]
    D, T, BB = x_ref.shape
    cdtype = x_ref.dtype
    dot_dx, dot_dw = _dots(cdtype)
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dw_refs:
            ref[...] = jnp.zeros_like(ref)

    wd = _wd_attn(w_refs)
    # recompute per token column: LN (stats kept for the LN backward) +
    # qkv dense, streamed into scratch
    stats = []
    for t in range(T):
        sl = slice(t * BB, (t + 1) * BB)
        x = x_ref[:, t, :].astype(f32)
        mu, inv, _, y1 = _ln_col_fwd(x, wd["ln1_s"], wd["ln1_b"])
        stats.append((mu, inv))
        y1_scr[:, sl] = y1.astype(cdtype)
        qkv_scr[:, sl] = _dense(wd["qkv_w"], wd["qkv_b"],
                                y1.astype(cdtype), cdtype).astype(cdtype)
    # probs tiles + the o columns (o only feeds dW_proj)
    probs = _probs_lanes(qkv_scr, num_heads, T, BB)
    _attn_fwd_hb(qkv_scr, num_heads, T, BB, o_ref=o_scr, probs=probs)
    da_slab = g_ref[:].reshape(D, T * BB)
    do_scr[:] = dot_dx(wd["proj_w"], da_slab)
    dW = {"proj_w": dot_dw(o_scr[:], da_slab), "proj_b": None}

    # attention grad columns streamed into dqkv scratch; bias grad summed
    # from the fp32 column before the storage cast
    dqkv_b = [None]

    def consume(t, dqkv_col):
        dqkv_scr[:, t * BB:(t + 1) * BB] = dqkv_col.astype(cdtype)
        dqkv_b[0] = _acc(dqkv_b[0], jnp.sum(dqkv_col, axis=1))

    _attn_bwd_stream(do_scr, qkv_scr, num_heads, T, BB, consume,
                     probs=probs)
    dW["qkv_w"] = dot_dw(y1_scr[:], dqkv_scr[:])
    dW["qkv_b"] = dqkv_b[0]

    # dy1 + LN backward, column-streamed (xh rebuilt from x_ref + stats)
    dln1_s = dln1_b = dpb = None
    for t in range(T):
        sl = slice(t * BB, (t + 1) * BB)
        dy1 = dot_dx(wd["qkv_w"], dqkv_scr[:, sl])
        mu, inv = stats[t]
        xh1 = (x_ref[:, t, :].astype(f32) - mu) * inv
        dln1_s = _acc(dln1_s, jnp.sum(dy1 * xh1, axis=1))
        dln1_b = _acc(dln1_b, jnp.sum(dy1, axis=1))
        da = g_ref[:, t, :].astype(f32)
        dpb = _acc(dpb, jnp.sum(da, axis=1))
        dx_ref[:, t, :] = (da + _ln_bwd(dy1, xh1, inv, wd["ln1_s"])
                           ).astype(cdtype)
    dW["ln1_s"] = dln1_s
    dW["ln1_b"] = dln1_b
    dW["proj_b"] = dpb
    _flush_dw(dw_refs, ("ln1_s", "ln1_b", "qkv_w", "qkv_b",
                        "proj_w", "proj_b"), dW)


def _block_n(n, block):
    if jax.default_backend() != "tpu":
        return max(8, int(np.ceil(n / 8)) * 8) if n < block else block
    return block


def _fit_block(Np, block):
    """Largest width <= ``block`` that DIVIDES the padded slab length. The
    slab impls recompute their width from Np (they can be entered with a
    slab padded for a DIFFERENT width — e.g. _bwd_impl pads once for the
    wider MLP half, or the stack pads for max(fwd, bwd)); a non-dividing
    width silently truncates the grid and drops tail windows' outputs
    (r3 review finding: grads for windows >= grid*bn were never written).
    gcd keeps every invariant: it divides Np, and since Np and block are
    both multiples of the 128-lane quantum (8 on CPU), so is the gcd."""
    import math
    return math.gcd(Np, block)


_COMPILER = pltpu.CompilerParams(vmem_limit_bytes=127 * 1024 * 1024)


def _fwd_impl_slab(xt, wp, num_heads, save_x2=False):
    """Forward on an already-padded (D, T, Np) slab; returns slab(s)."""
    D, T, Np = xt.shape
    bn = _fit_block(Np, _block_n(Np, BLOCK_N_FWD))
    wl = _lift(wp)
    out_shape = [jax.ShapeDtypeStruct((D, T, Np), xt.dtype)]
    out_specs = [_x_spec(D, T, bn)]
    if save_x2:
        out_shape.append(jax.ShapeDtypeStruct((D, T, Np), xt.dtype))
        out_specs.append(_x_spec(D, T, bn))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads, save_x2=save_x2),
        out_shape=out_shape,
        grid=(Np // bn,),
        in_specs=[_x_spec(D, T, bn)] + [_w_spec(w) for w in wl],
        out_specs=out_specs,
        scratch_shapes=[pltpu.VMEM((D, T * bn), xt.dtype)],
        compiler_params=_COMPILER,
        interpret=jax.default_backend() != "tpu",
    )(xt, *wl)
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    return (outs[0], outs[1]) if save_x2 else outs[0]


def _fwd_impl(x, wp, num_heads, save_x2=False):
    N, T, D = x.shape
    bn = _block_n(N, BLOCK_N_FWD)
    xt, Np = _prep(x, bn)
    outs = _fwd_impl_slab(xt, wp, num_heads, save_x2=save_x2)
    if save_x2:
        return (jnp.transpose(outs[0], (2, 1, 0))[:N],
                jnp.transpose(outs[1], (2, 1, 0))[:N])
    return jnp.transpose(outs, (2, 1, 0))[:N]


def _bwd_impl_slab(xt, x2t, wp, gt, num_heads):
    """Backward on already-padded (D, T, Np) slabs; returns (dx slab, dws).

    Two pallas calls — MLP half then attention half. One fused kernel
    for the whole block backward spilled ~130 MB of vregs at PoseFormer
    shapes (the recompute + reverse dataflow keeps too many slab-sized
    values live for Mosaic's register allocator); each half alone fits
    comfortably, and the forward saves x2 so neither half recomputes the
    other."""
    D, T, Np = xt.shape
    bn_mlp = _fit_block(Np, _block_n(Np, BLOCK_N_BWD_MLP))
    bn_attn = _fit_block(Np, _block_n(Np, BLOCK_N_BWD_ATTN))
    wl = _lift(wp)
    wl_attn, wl_mlp = wl[:6], wl[6:]

    def half(kernel, x_in, w6, g_in, extra_scratch, bn):
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w6]
        return pl.pallas_call(
            functools.partial(kernel, num_heads=num_heads),
            out_shape=[jax.ShapeDtypeStruct((D, T, Np), xt.dtype)]
            + dw_shapes,
            grid=(Np // bn,),
            in_specs=[_x_spec(D, T, bn)] + [_w_spec(w) for w in w6]
            + [_x_spec(D, T, bn)],
            out_specs=[_x_spec(D, T, bn)] + [_w_spec(w) for w in w6],
            scratch_shapes=extra_scratch,
            compiler_params=_COMPILER,
            interpret=jax.default_backend() != "tpu",
        )(x_in, *w6, g_in)

    cdtype = xt.dtype
    MLP = wp[8].shape[1]  # fc1_w (D, MLP)
    # streamed-slab scratch (see the kernels' docstrings): compute-dtype
    # except do (fp32 — it feeds the softmax backward's dp tiles, where
    # bf16 rounding would show against the XLA oracle)
    mlp_scratch = [pltpu.VMEM((D, T * bn_mlp), cdtype),        # y2
                   pltpu.VMEM((MLP, T * bn_mlp), cdtype),      # gelu(h)
                   pltpu.VMEM((MLP, T * bn_mlp), cdtype)]      # dh
    attn_scratch = [pltpu.VMEM((D, T * bn_attn), cdtype),          # y1
                    pltpu.VMEM((3 * D, T * bn_attn), cdtype),      # qkv
                    pltpu.VMEM((D, T * bn_attn), cdtype),          # o
                    pltpu.VMEM((D, T * bn_attn), jnp.float32),     # do
                    pltpu.VMEM((3 * D, T * bn_attn), cdtype)]      # dqkv
    dx2, *dw_mlp = half(_bwd_mlp_kernel, x2t, wl_mlp, gt, mlp_scratch,
                        bn_mlp)
    dx, *dw_attn = half(_bwd_attn_kernel, xt, wl_attn, dx2, attn_scratch,
                        bn_attn)
    dws = list(dw_attn) + list(dw_mlp)
    return dx, tuple(dw.reshape(w.shape).astype(w.dtype)
                     for dw, w in zip(dws, wp))


def _bwd_impl(x, x2, wp, g, num_heads):
    N, T, D = x.shape
    bn = _block_n(N, max(BLOCK_N_BWD_MLP, BLOCK_N_BWD_ATTN))
    xt, Np = _prep(x, bn)
    x2t, _ = _prep(x2, bn)
    gt, _ = _prep(g, bn)
    dx, dws = _bwd_impl_slab(xt, x2t, wp, gt, num_heads)
    return jnp.transpose(dx, (2, 1, 0))[:N], dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_block_p(x, wp, num_heads):
    return _fwd_impl(x, wp, num_heads)


def _vjp_fwd(x, wp, num_heads):
    y, x2 = _fwd_impl(x, wp, num_heads, save_x2=True)
    return y, (x, x2, wp)


def _vjp_bwd(num_heads, residuals, g):
    x, x2, wp = residuals
    return _bwd_impl(x, x2, wp, g, num_heads)


_fused_block_p.defvjp(_vjp_fwd, _vjp_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_block_slab_p(xt, wp, num_heads):
    """Slab-resident block: (D, T, Np) in, (D, T, Np) out — the stack entry
    point keeps activations in kernel layout across blocks so the
    (N, T, D) <-> (D, T, Np) transposes are paid once per STACK, not once
    per block per direction per pass (the r3 probe prices the per-block
    round-trips at several ms of pure relayout)."""
    return _fwd_impl_slab(xt, wp, num_heads)


def _vjp_fwd_slab(xt, wp, num_heads):
    y, x2 = _fwd_impl_slab(xt, wp, num_heads, save_x2=True)
    return y, (xt, x2, wp)


def _vjp_bwd_slab(num_heads, residuals, g):
    xt, x2, wp = residuals
    return _bwd_impl_slab(xt, x2, wp, g, num_heads)


_fused_block_slab_p.defvjp(_vjp_fwd_slab, _vjp_bwd_slab)


def _permute(weights, num_heads):
    """(head, dim) -> (dim, head) feature order for q/k/v columns and proj
    rows — plain gathers OUTSIDE the custom_vjp, so their transpose is
    autodiffed and callers keep the standard (torch-compatible) layout."""
    (ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b, *rest) = weights
    D = qkv_w.shape[0]
    perm = _head_interleave_perm(D, num_heads)
    qkv_w = jnp.concatenate(
        [qkv_w[:, i * D:(i + 1) * D][:, perm] for i in range(3)], axis=1)
    qkv_b = jnp.concatenate(
        [qkv_b[i * D:(i + 1) * D][perm] for i in range(3)])
    return (ln1_s, ln1_b, qkv_w, qkv_b, proj_w[perm, :], proj_b, *rest)


def fused_temporal_block(x, weights, num_heads):
    """One pre-norm transformer block (LN -> MHA -> residual -> LN -> MLP ->
    residual), fused into a single Pallas kernel.

    x: (N, T, D) token-major; weights: the 12-tuple documented at the top of
    this module in the STANDARD layout (same dtype as x for full-rate MXU
    bf16). Differentiable in x and every weight (hand-written Pallas
    backward). Exact flax ``_Block`` math except dropout (gate at the
    caller). Apply depth times for a stack; the final LayerNorm stays a
    plain flax module (one cheap XLA op)."""
    return _fused_block_p(x, _permute(weights, num_heads), num_heads)


def fused_temporal_stack(x, weights_list, num_heads):
    """A whole stack of fused blocks with ONE layout round-trip: transpose/
    pad (N, T, D) -> (D, T, Np) once, run every block slab-to-slab, and
    transpose back once. Numerically identical to applying
    :func:`fused_temporal_block` per block (the per-block path transposes
    back and forth between every pair of blocks — and for x/x2/g again in
    the backward). ``weights_list``: one 12-tuple per block."""
    N = x.shape[0]
    # pad once to a multiple every fwd/bwd block width divides
    bn = max(_block_n(N, BLOCK_N_FWD), _block_n(N, BLOCK_N_BWD_MLP),
             _block_n(N, BLOCK_N_BWD_ATTN))
    xt, _ = _prep(x, bn)
    for wp in weights_list:
        xt = _fused_block_slab_p(xt, _permute(wp, num_heads), num_heads)
    return jnp.transpose(xt, (2, 1, 0))[:N]


def temporal_block_reference(x, weights, num_heads):
    """Pure-XLA mirror of the kernel math (numerical oracle for tests)."""
    N, T, D = x.shape
    wp = _permute(weights, num_heads)
    xt = jnp.transpose(x, (2, 1, 0)).reshape(D, T * N).astype(jnp.float32)
    wd = _wd_from(_lift(wp))
    y, _ = _block_fwd(
        xt, wd, num_heads, T, N, x.dtype,
        attn_fwd=lambda q3, nh, TT, BBB: _attn_fwd_hb(
            q3.reshape(q3.shape[0], TT * BBB), nh, TT, BBB))
    y = y.astype(x.dtype).reshape(D, T, N)
    return jnp.transpose(y, (2, 1, 0))
