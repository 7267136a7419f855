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

#: windows per grid step (lane width). The backward holds fp32 weight-grad
#: accumulators (22 MB at PoseFormer shapes) next to the recompute residuals,
#: so it runs a narrower block than the forward (256 fails to compile for the
#: backward halves; measured fwd 26.1 ms @128 -> 24.6 ms @256).
BLOCK_N_FWD = int(os.environ.get("PVC_TEMPORAL_BLOCK_FWD", 256))
BLOCK_N_BWD = int(os.environ.get("PVC_TEMPORAL_BLOCK_BWD", 128))
#: the two backward halves are separate pallas calls with different VMEM
#: live sets, so they take independent widths; defaults = measured winners
#: (mlp-half fits 256 and gains, attn-half's dqkv scratch + fp32 qkv-grad
#: accumulators exceed VMEM at 256)
BLOCK_N_BWD_MLP = int(os.environ.get("PVC_TEMPORAL_BLOCK_BWD_MLP",
                                     2 * BLOCK_N_BWD))
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


def _flush_one(ref, contrib):
    """Accumulate ONE weight-grad contribution into its constant-index-map
    output ref (running sums across sequential grid steps; initialized at
    program 0). Flushing each contribution AS SOON as it is computed keeps
    the (in, out)-sized fp32 results from staying live to the end of the
    kernel, where they would dominate the register allocator's spill
    slots."""
    contrib = contrib.astype(ref.dtype)
    if contrib.ndim < ref.ndim:   # lifted 1-D bias/scale grads
        contrib = contrib[None]
    ref[...] += contrib


def _ln_col_fwd(x, s, b):
    """Per-column LayerNorm recompute that also returns the (mu, inv)
    stats (column streaming: stats are per-column, so token columns are
    independent)."""
    mu = jnp.mean(x, axis=0, keepdims=True)
    var = jnp.maximum(jnp.mean(x * x, axis=0, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xh = (x - mu) * inv
    return mu, inv, xh, xh * s + b


def _bwd_mlp_kernel(x2_ref, *refs, num_heads):
    """Backward of the MLP half: (x2, g) -> (dx2, dW_mlp).

    COLUMN-STREAMING dataflow (r4): each token column is recomputed and
    back-propagated independently inside a ``fori_loop`` with a TRACED
    index (LayerNorm stats are per-column, so the MLP half has no
    cross-token dependency); the only slab-sized buffers are explicit
    VMEM scratch slabs in the compute dtype that feed the two
    per-grid-step weight-grad matmuls. The r3 full-slab version kept
    every intermediate (xh2, y2, h, g, du, dgl, dh, dy2) live as SSA
    values, which the register allocator spilled; A/B on the real chip:
    7.41 ms vs 7.78 ms per block at the PoseFormer shape. (The same
    restructure LOSES on the attention half — its cross-token softmax
    tiles serialize the fori body, 11.4 vs 8.8 ms — so that half keeps
    the r3 unrolled streaming form.)"""
    del num_heads
    w_refs = refs[:6]
    g_ref = refs[6]
    dx2_ref = refs[7]
    dw_refs = refs[8:14]
    y2_scr, g_scr, dh_scr, dx_scr, xfl_scr, gfl_scr = refs[14:]
    D, T, BB = x2_ref.shape
    cdtype = x2_ref.dtype
    dot_dx, dot_dw = _dots(cdtype)
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dw_refs:
            ref[...] = jnp.zeros_like(ref)

    wd = _wd_mlp(w_refs)
    MLP = wd["fc1_w"].shape[1]
    # flat (D, T*BB) copies in scratch; columns are LANE slices at
    # multiples of the 128-lane quantum (sublane-offset slices like
    # x2_ref[:, t, :] hit a Mosaic limitation — reductions over
    # offset-layout dims don't compile — and dynamic_slice lowers only
    # on REFS, so the flats live in scratch, not as values)
    xfl_scr[:] = x2_ref[:].reshape(D, T * BB)
    gfl_scr[:] = g_ref[:].reshape(D, T * BB)

    def cs(t):
        return pl.ds(pl.multiple_of(t * BB, BB), BB)

    def body(t, carry):
        dln2_s, dln2_b, dfc1_b, dfc2_b = carry
        x2 = xfl_scr[:, cs(t)].astype(f32)
        _, inv2, xh2, y2 = _ln_col_fwd(x2, wd["ln2_s"], wd["ln2_b"])
        y2_scr[:, cs(t)] = y2.astype(cdtype)
        h = _dense(wd["fc1_w"], wd["fc1_b"], y2.astype(cdtype), cdtype)
        g_scr[:, cs(t)] = _gelu(h).astype(cdtype)
        du = gfl_scr[:, cs(t)].astype(f32)
        dgl = dot_dx(wd["fc2_w"], du)
        dh = dgl * _dgelu(h)
        dh_scr[:, cs(t)] = dh.astype(cdtype)
        dy2 = dot_dx(wd["fc1_w"], dh.astype(cdtype))
        dx_scr[:, cs(t)] = (du + _ln_bwd(dy2, xh2, inv2, wd["ln2_s"])
                            ).astype(cdtype)
        return (dln2_s + jnp.sum(dy2 * xh2, axis=1),
                dln2_b + jnp.sum(dy2, axis=1),
                dfc1_b + jnp.sum(dh, axis=1),
                dfc2_b + jnp.sum(du, axis=1))

    dln2_s, dln2_b, dfc1_b, dfc2_b = jax.lax.fori_loop(
        0, T, body, (jnp.zeros((D,), f32), jnp.zeros((D,), f32),
                     jnp.zeros((MLP,), f32), jnp.zeros((D,), f32)))
    dx2_ref[:] = dx_scr[:].reshape(D, T, BB)
    # dw_refs order: (ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b)
    _flush_one(dw_refs[0], dln2_s)
    _flush_one(dw_refs[1], dln2_b)
    _flush_one(dw_refs[2], dot_dw(y2_scr[:], dh_scr[:]))
    _flush_one(dw_refs[3], dfc1_b)
    _flush_one(dw_refs[4], dot_dw(g_scr[:], gfl_scr[:]))
    _flush_one(dw_refs[5], dfc2_b)


def _bwd_attn_kernel(x_ref, *refs, num_heads):
    """Backward of the attention half: (x, dx2) -> (dx, dW_attn).

    The attention gradient is consumed COLUMN-WISE: dy1 and the qkv weight
    grads decompose per token (dy1 cols = qkv_w x dqkv_col; dW_qkv = sum_t
    y1_col dqkv_col^T), so the (3D, T*BB) dqkv slab is never materialized —
    only one (3D, BB) column lives at a time. That VMEM cut is what lets
    this half run the same 256-window grid block as the forward."""
    w_refs = refs[:6]
    g_ref = refs[6]
    dx_ref = refs[7]
    dw_refs = refs[8:14]
    (dy1_scr,) = refs[14:]
    D, T, BB = x_ref.shape
    cdtype = x_ref.dtype
    dot_dx, dot_dw = _dots(cdtype)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dw_refs:
            ref[...] = jnp.zeros_like(ref)

    wd = _wd_attn(w_refs)
    x = x_ref[:].reshape(D, T * BB).astype(jnp.float32)
    # recompute up to qkv/probs; the attention output o is consumed
    # COLUMN-WISE below (it only feeds dW_proj), so it is never
    # materialized and the proj dense of the fwd is never re-run
    xh1, inv1, y1f = _ln_fwd(x, wd["ln1_s"], wd["ln1_b"])
    qkv = _dense(wd["qkv_w"], wd["qkv_b"], y1f, cdtype).astype(cdtype)
    y1 = y1f.astype(cdtype)
    probs = _probs_lanes(qkv, num_heads, T, BB)
    H = num_heads
    HD = D // H
    da = g_ref[:].reshape(D, T * BB).astype(jnp.float32)
    do = dot_dx(wd["proj_w"], da)
    dWp = None
    for tq in range(T):
        acc_o = None
        for tk in range(T):
            vt = qkv[2 * D:, tk * BB:(tk + 1) * BB].astype(jnp.float32)
            contrib = vt.reshape(HD, H, BB) * probs[tq][tk][None]
            acc_o = contrib if acc_o is None else acc_o + contrib
        o_col = acc_o.reshape(D, BB).astype(cdtype)
        pc = dot_dw(o_col, da[:, tq * BB:(tq + 1) * BB])
        dWp = pc if dWp is None else dWp + pc
    # eager flushes (r4): each weight-grad contribution lands in its
    # output ref the moment it is complete instead of at one end-of-kernel
    # flush, so the (in, out)-sized fp32 results stop being long-lived
    # spill-slot residents. dw_refs order:
    # (ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b)
    _flush_one(dw_refs[4], dWp)
    _flush_one(dw_refs[5], jnp.sum(da, axis=1))
    acc = {"qkv_w": None, "qkv_b": None}

    def consume(t, dqkv_col):
        sl = slice(t * BB, (t + 1) * BB)
        dy1_scr[:, sl] = dot_dx(wd["qkv_w"], dqkv_col).astype(
            dy1_scr.dtype)
        contrib = dot_dw(y1[:, sl], dqkv_col)
        acc["qkv_w"] = contrib if acc["qkv_w"] is None \
            else acc["qkv_w"] + contrib
        csum = jnp.sum(dqkv_col, axis=1)
        acc["qkv_b"] = csum if acc["qkv_b"] is None \
            else acc["qkv_b"] + csum

    _attn_bwd_stream(do, qkv, num_heads, T, BB, consume, probs=probs)
    _flush_one(dw_refs[2], acc["qkv_w"])
    _flush_one(dw_refs[3], acc["qkv_b"])
    dy1 = dy1_scr[:].astype(jnp.float32)
    _flush_one(dw_refs[0], jnp.sum(dy1 * xh1, axis=1))
    _flush_one(dw_refs[1], jnp.sum(dy1, axis=1))
    dx = da + _ln_bwd(dy1, xh1, inv1, wd["ln1_s"])
    dx_ref[:] = dx.astype(cdtype).reshape(D, T, BB)


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
    mlp_scratch = [pltpu.VMEM((D, T * bn_mlp), cdtype),        # y2
                   pltpu.VMEM((MLP, T * bn_mlp), cdtype),      # gelu(h)
                   pltpu.VMEM((MLP, T * bn_mlp), cdtype),      # dh
                   pltpu.VMEM((D, T * bn_mlp), cdtype),        # dx2 cols
                   pltpu.VMEM((D, T * bn_mlp), cdtype),        # x flat
                   pltpu.VMEM((D, T * bn_mlp), cdtype)]        # g flat
    dx2, *dw_mlp = half(_bwd_mlp_kernel, x2t, wl_mlp, gt, mlp_scratch,
                        bn_mlp)
    # scratch: dy1 fp32 (feeds the LN backward + scale/bias grads, where
    # bf16 rounding would show); the o slab is streamed, never stored
    dx, *dw_attn = half(_bwd_attn_kernel, xt, wl_attn, dx2,
                        [pltpu.VMEM((D, T * bn_attn), jnp.float32)],
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


# ---------------------------------------------------------------------------
# token-leading slab layout (r5, VERDICT r4 #2)
# ---------------------------------------------------------------------------
# The (D, T, Np) slabs above put the T=9 window tokens in the SUBLANE dim,
# which pads to the 16-sublane bf16 quantum: every slab operand (x, x2, g,
# dx, out — in HBM between blocks AND as VMEM block refs) physically
# carries 16/9 = 1.78x its logical bytes, and the kernels' entry
# ``reshape(D, T*BB)`` is a real relayout of that padded tile pattern.
# Token-leading (T, D, Np) slabs have ZERO padding — T is the untiled
# leading dim, D=832 divides the 16-sublane quantum, Np the 128-lane
# quantum — and every per-token operand ``ref[t]`` is a free (D, BB)
# plane: the layout the attention/LN math already wanted (lane index =
# window). Dense layers run per token (T matmuls of M=BB instead of one
# of M=T*BB; K and N unchanged, so MXU utilization holds), and the
# backward halves' VMEM live sets shrink by the same 44%, which is what
# lets the attention half run the forward's 256-lane grid block
# (the r4 padded-layout attempt missed VMEM by ~2 MB).

#: slab layout switch for the on-chip A/B: "tl" (token-leading, default)
#: or "legacy" ((D, T, Np) with padded sublanes)
LAYOUT = os.environ.get("PVC_TEMPORAL_LAYOUT", "tl")


def _prep_tl(x, block_n):
    """(N, T, D) token-major -> padding-free (T, D, Np) slabs."""
    n = x.shape[0]
    pad = (-n) % block_n
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return jnp.transpose(x, (1, 2, 0)), n + pad


def _x_spec_tl(T, D, BB):
    return pl.BlockSpec((T, D, BB), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)


def _probs_tl(qkv_ts, num_heads):
    """Softmax probabilities from per-token (3D, BB) planes; same tile math
    as :func:`_probs_lanes` with the column slices replaced by free
    leading-dim plane reads."""
    T = len(qkv_ts)
    D = qkv_ts[0].shape[0] // 3
    H = num_heads
    HD = D // H
    scale = float(HD) ** -0.5
    f32 = jnp.float32
    BB = qkv_ts[0].shape[1]

    probs = []
    for tq in range(T):
        qs = qkv_ts[tq][:D].astype(f32) * scale
        row = []
        for tk in range(T):
            prod = qs * qkv_ts[tk][D:2 * D].astype(f32)
            row.append(jnp.sum(prod.reshape(HD, H, BB), axis=0))  # (H, BB)
        m = functools.reduce(jnp.maximum, row)
        e = [jnp.exp(s - m) for s in row]
        inv = 1.0 / functools.reduce(jnp.add, e)
        probs.append([ei * inv for ei in e])
    return probs


def _attn_o_col(qkv_ts, probs, tq, num_heads):
    """One attention-output column o_tq (D, BB) fp32 from per-token qkv."""
    D = qkv_ts[0].shape[0] // 3
    H = num_heads
    HD = D // H
    BB = qkv_ts[0].shape[1]
    acc = None
    for tk in range(len(qkv_ts)):
        vt = qkv_ts[tk][2 * D:].astype(jnp.float32)
        contrib = vt.reshape(HD, H, BB) * probs[tq][tk][None]
        acc = contrib if acc is None else acc + contrib
    return acc.reshape(D, BB)


def _fwd_kernel_tl(x_ref, *refs, num_heads, save_x2):
    """Forward on a (T, D, BB) token-leading block: per-token LN + qkv,
    lane-tile attention, then a fully per-token residual/MLP stream (only
    one token's (D/MLP, BB) intermediates live at a time beside the qkv
    planes)."""
    w_refs = refs[:NUM_WEIGHTS]
    out_ref = refs[NUM_WEIGHTS]
    x2_ref = refs[NUM_WEIGHTS + 1] if save_x2 else None
    T, D, BB = x_ref.shape
    cdtype = x_ref.dtype
    f32 = jnp.float32
    wd_a = _wd_attn(w_refs[:6])
    wd_m = _wd_mlp(w_refs[6:])

    qkv_ts = []
    for t in range(T):
        _, _, y1 = _ln_fwd(x_ref[t].astype(f32), wd_a["ln1_s"],
                           wd_a["ln1_b"])
        qkv_ts.append(_dense(wd_a["qkv_w"], wd_a["qkv_b"], y1,
                             cdtype).astype(cdtype))
    probs = _probs_tl(qkv_ts, num_heads)
    for tq in range(T):
        o = _attn_o_col(qkv_ts, probs, tq, num_heads).astype(cdtype)
        a = _dense(wd_a["proj_w"], wd_a["proj_b"], o, cdtype)
        x2 = x_ref[tq].astype(f32) + a
        if save_x2:
            x2_ref[tq] = x2.astype(cdtype)
        _, _, y2 = _ln_fwd(x2, wd_m["ln2_s"], wd_m["ln2_b"])
        h = _dense(wd_m["fc1_w"], wd_m["fc1_b"], y2, cdtype)
        u = _dense(wd_m["fc2_w"], wd_m["fc2_b"], _gelu(h), cdtype)
        out_ref[tq] = (x2 + u).astype(cdtype)


def _bwd_mlp_kernel_tl(x2_ref, *refs, num_heads):
    """MLP-half backward on token-leading blocks: the r4 column-streaming
    ``fori_loop`` (the measured winner for this half), minus the flat
    staging copies — token columns are now direct dynamic-index reads of
    the (T, D, BB) refs, and dx2 columns store straight to the output ref
    instead of round-tripping a scratch slab. Per-token (y2, gelu, dh, du)
    columns still stage into flat scratch for the two end-of-kernel
    weight-grad matmuls."""
    del num_heads
    w_refs = refs[:6]
    g_ref = refs[6]
    dx2_ref = refs[7]
    dw_refs = refs[8:14]
    y2_scr, g_scr, dh_scr, du_scr = refs[14:]
    T, D, BB = x2_ref.shape
    cdtype = x2_ref.dtype
    dot_dx, dot_dw = _dots(cdtype)
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dw_refs:
            ref[...] = jnp.zeros_like(ref)

    wd = _wd_mlp(w_refs)
    MLP = wd["fc1_w"].shape[1]

    def cs(t):
        return pl.ds(pl.multiple_of(t * BB, BB), BB)

    def col(ref, t):  # dynamic leading-index read: (T, D, BB)[t] -> (D, BB)
        return ref[pl.ds(t, 1)][0]

    def body(t, carry):
        dln2_s, dln2_b, dfc1_b, dfc2_b = carry
        x2 = col(x2_ref, t).astype(f32)
        _, inv2, xh2, y2 = _ln_col_fwd(x2, wd["ln2_s"], wd["ln2_b"])
        y2_scr[:, cs(t)] = y2.astype(cdtype)
        h = _dense(wd["fc1_w"], wd["fc1_b"], y2.astype(cdtype), cdtype)
        g_scr[:, cs(t)] = _gelu(h).astype(cdtype)
        du = col(g_ref, t).astype(f32)
        du_scr[:, cs(t)] = du.astype(cdtype)
        dgl = dot_dx(wd["fc2_w"], du)
        dh = dgl * _dgelu(h)
        dh_scr[:, cs(t)] = dh.astype(cdtype)
        dy2 = dot_dx(wd["fc1_w"], dh.astype(cdtype))
        dx2_ref[pl.ds(t, 1)] = (du + _ln_bwd(dy2, xh2, inv2, wd["ln2_s"])
                                ).astype(cdtype)[None]
        return (dln2_s + jnp.sum(dy2 * xh2, axis=1),
                dln2_b + jnp.sum(dy2, axis=1),
                dfc1_b + jnp.sum(dh, axis=1),
                dfc2_b + jnp.sum(du, axis=1))

    dln2_s, dln2_b, dfc1_b, dfc2_b = jax.lax.fori_loop(
        0, T, body, (jnp.zeros((D,), f32), jnp.zeros((D,), f32),
                     jnp.zeros((MLP,), f32), jnp.zeros((D,), f32)))
    # dw_refs order: (ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b)
    _flush_one(dw_refs[0], dln2_s)
    _flush_one(dw_refs[1], dln2_b)
    _flush_one(dw_refs[2], dot_dw(y2_scr[:], dh_scr[:]))
    _flush_one(dw_refs[3], dfc1_b)
    _flush_one(dw_refs[4], dot_dw(g_scr[:], du_scr[:]))
    _flush_one(dw_refs[5], dfc2_b)


def _attn_bwd_stream_tl(do_ts, qkv_ts, num_heads, T, consume, probs):
    """Token-leading mirror of :func:`_attn_bwd_stream`: operands are
    per-token plane lists instead of flat-slab column slices."""
    D = qkv_ts[0].shape[0] // 3
    H = num_heads
    HD = D // H
    scale = float(HD) ** -0.5
    f32 = jnp.float32
    BB = qkv_ts[0].shape[1]

    def h3(x):
        return x.reshape(HD, H, BB)

    def lane(base, t):
        return qkv_ts[t][base:base + D].astype(f32)

    dp = [[jnp.sum(h3(do_ts[tq] * lane(2 * D, tk)), axis=0)
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
        dv = functools.reduce(jnp.add, (h3(do_ts[tq]) * probs[tq][t][None]
                                        for tq in range(T)))
        consume(t, jnp.concatenate(
            [dq.reshape(D, BB) * scale, dk.reshape(D, BB) * scale,
             dv.reshape(D, BB)], axis=0))


def _bwd_attn_kernel_tl(x_ref, *refs, num_heads):
    """Attention-half backward on token-leading blocks: the r4 unrolled
    streaming structure (the measured winner for this half — the softmax
    tiles couple tokens, so a fori restructure loses MXU/VPU overlap)
    with all slab operands as free per-token plane reads. The 44% VMEM
    cut vs the padded layout is what admits BLOCK_N_BWD_ATTN = the
    forward's 256."""
    w_refs = refs[:6]
    g_ref = refs[6]
    dx_ref = refs[7]
    dw_refs = refs[8:14]
    (dy1_scr,) = refs[14:]
    T, D, BB = x_ref.shape
    cdtype = x_ref.dtype
    dot_dx, dot_dw = _dots(cdtype)
    f32 = jnp.float32

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dw_refs:
            ref[...] = jnp.zeros_like(ref)

    wd = _wd_attn(w_refs)
    xh1_ts, inv1_ts, y1_ts, qkv_ts = [], [], [], []
    for t in range(T):
        xh1, inv1, y1 = _ln_fwd(x_ref[t].astype(f32), wd["ln1_s"],
                                wd["ln1_b"])
        xh1_ts.append(xh1)
        inv1_ts.append(inv1)
        y1_ts.append(y1.astype(cdtype))
        qkv_ts.append(_dense(wd["qkv_w"], wd["qkv_b"], y1,
                             cdtype).astype(cdtype))
    probs = _probs_tl(qkv_ts, num_heads)
    do_ts = []
    dWp = None
    dpb = None
    for tq in range(T):
        da = g_ref[tq].astype(f32)
        do_ts.append(dot_dx(wd["proj_w"], da))
        o_col = _attn_o_col(qkv_ts, probs, tq, num_heads).astype(cdtype)
        pc = dot_dw(o_col, da)
        dWp = pc if dWp is None else dWp + pc
        bs = jnp.sum(da, axis=1)
        dpb = bs if dpb is None else dpb + bs
    _flush_one(dw_refs[4], dWp)
    _flush_one(dw_refs[5], dpb)
    acc = {"qkv_w": None, "qkv_b": None}

    def consume(t, dqkv_col):
        dy1_scr[t] = dot_dx(wd["qkv_w"], dqkv_col)
        contrib = dot_dw(y1_ts[t], dqkv_col)
        acc["qkv_w"] = contrib if acc["qkv_w"] is None \
            else acc["qkv_w"] + contrib
        csum = jnp.sum(dqkv_col, axis=1)
        acc["qkv_b"] = csum if acc["qkv_b"] is None \
            else acc["qkv_b"] + csum

    _attn_bwd_stream_tl(do_ts, qkv_ts, num_heads, T, consume, probs)
    _flush_one(dw_refs[2], acc["qkv_w"])
    _flush_one(dw_refs[3], acc["qkv_b"])
    dls = None
    dlb = None
    for t in range(T):
        dy1 = dy1_scr[t]
        s_c = jnp.sum(dy1 * xh1_ts[t], axis=1)
        b_c = jnp.sum(dy1, axis=1)
        dls = s_c if dls is None else dls + s_c
        dlb = b_c if dlb is None else dlb + b_c
        dx = g_ref[t].astype(f32) + _ln_bwd(dy1, xh1_ts[t], inv1_ts[t],
                                            wd["ln1_s"])
        dx_ref[t] = dx.astype(cdtype)
    _flush_one(dw_refs[0], dls)
    _flush_one(dw_refs[1], dlb)


def _fwd_impl_slab_tl(xt, wp, num_heads, save_x2=False):
    """Forward on an already-padded (T, D, Np) slab; returns slab(s)."""
    T, D, Np = xt.shape
    bn = _fit_block(Np, _block_n(Np, _tl_widths(xt.dtype)[0]))
    wl = _lift(wp)
    out_shape = [jax.ShapeDtypeStruct((T, D, Np), xt.dtype)]
    out_specs = [_x_spec_tl(T, D, bn)]
    if save_x2:
        out_shape.append(jax.ShapeDtypeStruct((T, D, Np), xt.dtype))
        out_specs.append(_x_spec_tl(T, D, bn))
    outs = pl.pallas_call(
        functools.partial(_fwd_kernel_tl, num_heads=num_heads,
                          save_x2=save_x2),
        out_shape=out_shape,
        grid=(Np // bn,),
        in_specs=[_x_spec_tl(T, D, bn)] + [_w_spec(w) for w in wl],
        out_specs=out_specs,
        compiler_params=_COMPILER,
        interpret=jax.default_backend() != "tpu",
    )(xt, *wl)
    outs = outs if isinstance(outs, (list, tuple)) else [outs]
    return (outs[0], outs[1]) if save_x2 else outs[0]


def _bwd_impl_slab_tl(xt, x2t, wp, gt, num_heads):
    """Backward on already-padded (T, D, Np) slabs; returns (dx slab, dws).
    Same two-pallas-call split as the legacy layout (one fused backward
    spills); the attention half now runs the same width as the MLP half."""
    T, D, Np = xt.shape
    _, w_mlp, w_attn = _tl_widths(xt.dtype)
    bn_mlp = _fit_block(Np, _block_n(Np, w_mlp))
    bn_attn = _fit_block(Np, _block_n(Np, w_attn))
    wl = _lift(wp)
    wl_attn, wl_mlp = wl[:6], wl[6:]

    def half(kernel, x_in, w6, g_in, extra_scratch, bn):
        dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in w6]
        return pl.pallas_call(
            functools.partial(kernel, num_heads=num_heads),
            out_shape=[jax.ShapeDtypeStruct((T, D, Np), xt.dtype)]
            + dw_shapes,
            grid=(Np // bn,),
            in_specs=[_x_spec_tl(T, D, bn)] + [_w_spec(w) for w in w6]
            + [_x_spec_tl(T, D, bn)],
            out_specs=[_x_spec_tl(T, D, bn)] + [_w_spec(w) for w in w6],
            scratch_shapes=extra_scratch,
            compiler_params=_COMPILER,
            interpret=jax.default_backend() != "tpu",
        )(x_in, *w6, g_in)

    cdtype = xt.dtype
    MLP = wp[8].shape[1]  # fc1_w (D, MLP)
    mlp_scratch = [pltpu.VMEM((D, T * bn_mlp), cdtype),        # y2
                   pltpu.VMEM((MLP, T * bn_mlp), cdtype),      # gelu(h)
                   pltpu.VMEM((MLP, T * bn_mlp), cdtype),      # dh
                   pltpu.VMEM((D, T * bn_mlp), cdtype)]        # du
    dx2, *dw_mlp = half(_bwd_mlp_kernel_tl, x2t, wl_mlp, gt, mlp_scratch,
                        bn_mlp)
    dx, *dw_attn = half(_bwd_attn_kernel_tl, xt, wl_attn, dx2,
                        [pltpu.VMEM((T, D, bn_attn), jnp.float32)],
                        bn_attn)
    dws = list(dw_attn) + list(dw_mlp)
    return dx, tuple(dw.reshape(w.shape).astype(w.dtype)
                     for dw, w in zip(dws, wp))


#: token-leading attn-half backward width: the 44% VMEM cut admits the
#: forward's 256 (the padded layout OOMed at 256 by ~2 MB); 512 OOMs.
BLOCK_N_BWD_ATTN_TL = int(os.environ.get("PVC_TEMPORAL_BLOCK_BWD_ATTN_TL",
                                         256))
#: token-leading forward width: 512 measured fastest (21.4 -> 20.3 ms
#: fwd/stack at PoseFormer B1024 bf16 shapes); MLP-half backward keeps 256
#: (512 exceeds VMEM by 7.5 MB — 31 MB of spill slots + 3 double-buffered
#: 14.6 MB windows). Widths must divide the padded slab length, so the
#: usable ladder at N=8192 is powers of two.
BLOCK_N_FWD_TL = int(os.environ.get("PVC_TEMPORAL_BLOCK_FWD_TL", 512))


def _tl_widths(dtype):
    """(fwd, mlp-bwd, attn-bwd) grid widths for the token-leading layout.
    fp32 doubles every buffer, so it runs HALF the bf16 widths for the
    same VMEM footprint — which compiles and runs where the legacy padded
    layout OOMed at any width (r4 negative result, now obsolete): measured
    85.4 ms/stack fwd+bwd fp32 vs 78.9 bf16 at PoseFormer B1024 shapes."""
    if dtype == jnp.float32:
        return (max(128, BLOCK_N_FWD_TL // 2),
                max(128, BLOCK_N_BWD_MLP // 2),
                max(128, BLOCK_N_BWD_ATTN_TL // 2))
    return (BLOCK_N_FWD_TL, BLOCK_N_BWD_MLP, BLOCK_N_BWD_ATTN_TL)


def _fwd_impl_tl(x, wp, num_heads, save_x2=False):
    N, T, D = x.shape
    bn = _block_n(N, _tl_widths(x.dtype)[0])
    xt, Np = _prep_tl(x, bn)
    outs = _fwd_impl_slab_tl(xt, wp, num_heads, save_x2=save_x2)
    if save_x2:
        return (jnp.transpose(outs[0], (2, 0, 1))[:N],
                jnp.transpose(outs[1], (2, 0, 1))[:N])
    return jnp.transpose(outs, (2, 0, 1))[:N]


def _bwd_impl_tl(x, x2, wp, g, num_heads):
    N, T, D = x.shape
    bn = _block_n(N, max(_tl_widths(x.dtype)))
    xt, Np = _prep_tl(x, bn)
    x2t, _ = _prep_tl(x2, bn)
    gt, _ = _prep_tl(g, bn)
    dx, dws = _bwd_impl_slab_tl(xt, x2t, wp, gt, num_heads)
    return jnp.transpose(dx, (2, 0, 1))[:N], dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_block_tl_p(x, wp, num_heads):
    return _fwd_impl_tl(x, wp, num_heads)


def _vjp_fwd_tl(x, wp, num_heads):
    y, x2 = _fwd_impl_tl(x, wp, num_heads, save_x2=True)
    return y, (x, x2, wp)


def _vjp_bwd_tl(num_heads, residuals, g):
    x, x2, wp = residuals
    return _bwd_impl_tl(x, x2, wp, g, num_heads)


_fused_block_tl_p.defvjp(_vjp_fwd_tl, _vjp_bwd_tl)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _fused_block_slab_tl_p(xt, wp, num_heads):
    """Slab-resident token-leading block: (T, D, Np) in/out."""
    return _fwd_impl_slab_tl(xt, wp, num_heads)


def _vjp_fwd_slab_tl(xt, wp, num_heads):
    y, x2 = _fwd_impl_slab_tl(xt, wp, num_heads, save_x2=True)
    return y, (xt, x2, wp)


def _vjp_bwd_slab_tl(num_heads, residuals, g):
    xt, x2, wp = residuals
    return _bwd_impl_slab_tl(xt, x2, wp, g, num_heads)


_fused_block_slab_tl_p.defvjp(_vjp_fwd_slab_tl, _vjp_bwd_slab_tl)


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
    wp = _permute(weights, num_heads)
    if LAYOUT == "tl":
        return _fused_block_tl_p(x, wp, num_heads)
    return _fused_block_p(x, wp, num_heads)


def fused_temporal_stack(x, weights_list, num_heads):
    """A whole stack of fused blocks with ONE layout round-trip: transpose/
    pad (N, T, D) -> (D, T, Np) once, run every block slab-to-slab, and
    transpose back once. Numerically identical to applying
    :func:`fused_temporal_block` per block (the per-block path transposes
    back and forth between every pair of blocks — and for x/x2/g again in
    the backward). ``weights_list``: one 12-tuple per block."""
    N = x.shape[0]
    if LAYOUT == "tl":
        bn = max(_block_n(N, w) for w in _tl_widths(x.dtype))
        xt, _ = _prep_tl(x, bn)
        for wp in weights_list:
            xt = _fused_block_slab_tl_p(xt, _permute(wp, num_heads),
                                        num_heads)
        return jnp.transpose(xt, (2, 0, 1))[:N]
    # pad once to a multiple every fwd/bwd block width divides
    bn = max(_block_n(N, BLOCK_N_FWD), _block_n(N, BLOCK_N_BWD_MLP),
             _block_n(N, BLOCK_N_BWD_ATTN))
    xt, _ = _prep(x, bn)
    for wp in weights_list:
        xt = _fused_block_slab_p(xt, _permute(wp, num_heads), num_heads)
    return jnp.transpose(xt, (2, 1, 0))[:N]


def fused_temporal_stack_from_slabs(slab, weights_list, num_heads):
    """Slab-in, slab-out stack: (T, D, N) -> ((T, D, Np), N).

    Token-leading layout only. The caller builds the input slab straight
    from its own data layout (PoseFormer: window tokens are contiguous
    lane ranges of the frame-major (D, L*B) per-frame embeddings) and
    runs slab-friendly head math on the output — LayerNorm over the
    feature axis is axis 1, token pooling a leading-axis contraction —
    transposing only the pooled (D, N) result. Skipping the (N, T, D)
    round-trips avoids a 122 MB relayout per direction per pass at
    PoseFormer B1024 shapes AND XLA re-padding the 9-token sublane axis
    to 16 for every op outside the kernel."""
    if LAYOUT != "tl":
        raise ValueError("fused_temporal_stack_from_slabs requires the "
                         "token-leading layout (PVC_TEMPORAL_LAYOUT=tl)")
    T, D, N = slab.shape
    bn = max(_block_n(N, w) for w in _tl_widths(slab.dtype))
    pad = (-N) % bn
    xt = jnp.pad(slab, ((0, 0), (0, 0), (0, pad))) if pad else slab
    for wp in weights_list:
        xt = _fused_block_slab_tl_p(xt, _permute(wp, num_heads), num_heads)
    return xt, N


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
