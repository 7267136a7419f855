"""Fused graph-convolutional GRU/LSTM scans as ONE Pallas TPU kernel each —
built for the classification GNN family (GConvGRU / DCRNN / TGCN /
SpatialTemporalGNN / GConvLSTM over 26-node skeleton graphs,
``models/classification/gnn.py``).

Why: the GRU recurrence over frames is inherently sequential, and on XLA the
B256/L16 two-layer stack costs ~3.1 ms forward but ~10 ms forward+backward
even fully unrolled (``tools/gnn_scan_probe.py``) — the backward replays 16
sequential frame steps, each round-tripping the ``(B, 26, H)`` carry and its
saved activations through HBM with a 26-sublane pad on every tensor. This
kernel runs the whole per-layer recurrence in one ``pallas_call``: the grid
walks (batch blocks, frames), the hidden-state carry lives in a VMEM scratch
that persists across frame steps, and the hand-written backward walks frames
in REVERSE (flash-style: gates are recomputed in VMEM from the emitted
hidden states, which double as the residuals) while weight gradients
accumulate across sequential grid steps into constant-index-map outputs.

TPU-native layout: activations are ``(L, ROWS, F)`` slabs with
``ROWS = groups x (J * BBR)`` — each *group* interleaves ``BBR = 4`` batch
elements under every joint, so the Chebyshev graph contraction
``y[b, i] = sum_j op[i, j] x[b, j]`` becomes a dense
``(J*BBR, J*BBR) @ (J*BBR, F)`` matmul per group against the precomputed
Kronecker constant ``T_n(op) ⊗ I_BBR`` (:func:`kron_cheb_ops`) — an MXU
contraction instead of a 26-way VPU broadcast-reduce, with J*BBR = 104 rows
sitting in a single 128-sublane MXU tile. Gate matmuls flatten the same rows
(row order is irrelevant to them), so the two views share one layout and the
layer chains into the next with ZERO relayouts.

Numerics: dot operands run in the slab compute dtype (``xg.dtype`` — bf16
under AMP so the MXU runs at full rate; fp32 otherwise, where TPU lowers the
dots to XLA's DEFAULT bf16-pass precision anyway) with fp32 accumulation;
the carry and every elementwise op stays fp32.

Math parity: the ``lax.scan`` formulation in
``models/classification/gnn.py::_GraphGRUCellMixin`` (torch_geometric_temporal
GConvGRU/DCRNN/TGCN cells; reference ``modules/classification/gnn/rnn.py``
uses those library cells). The Chebyshev basis identity used here:
``cheb_stack(op, h) @ W == sum_n T_n(op) @ (h @ W_n)`` — T_n(op) are (J, J)
constants, so they are precomputed host-side and applied AFTER the weight
matmul, never inside a recurrence over matrices.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

#: batch elements interleaved under each joint inside a group. J*BBR = 104
#: rows -> the per-group Kronecker contraction is one 128-sublane MXU tile
#: (the minimal padded shape; larger BBR scales the op-apply FLOPs linearly
#: for no utilization gain).
BBR = 4


def cheb_matrices(op: np.ndarray, k: int) -> list:
    """[T_0(op) .. T_{k-1}(op)] Chebyshev polynomials of the (J, J) graph
    operator (T_0 = I, T_1 = op, T_n = 2 op T_{n-1} - T_{n-2})."""
    op = np.asarray(op, np.float64)
    ts = [np.eye(op.shape[0]), op]
    for _ in range(max(0, k - 2)):
        ts.append(2.0 * op @ ts[-1] - ts[-2])
    return [t.astype(np.float32) for t in ts[:k]]


def kron_cheb_ops(op: np.ndarray, k: int, bbr: int = BBR) -> np.ndarray:
    """(k-1, J*bbr, J*bbr) stack of ``T_n(op) ⊗ I_bbr`` for n = 1..k-1 —
    the in-kernel graph contraction constants (T_0 = I is applied for free).
    Returns a (0, R, R) array for k == 1 (plain GCN-GRU, no expansion)."""
    j = op.shape[0]
    mats = [np.kron(t, np.eye(bbr, dtype=np.float32))
            for t in cheb_matrices(op, k)[1:]]
    return (np.stack(mats) if mats
            else np.zeros((0, j * bbr, j * bbr), np.float32))


def to_slabs(x: jnp.ndarray, bbr: int = BBR):
    """(B, L, J, C) -> ((L, Gt*J*bbr, C) slabs, B) with B zero-padded up to
    a multiple of ``bbr``; row order (group, joint, batch-within-group)."""
    B, L, J, C = x.shape
    bp = -(-B // bbr) * bbr
    if bp != B:
        x = jnp.concatenate(
            [x, jnp.zeros((bp - B,) + x.shape[1:], x.dtype)], axis=0)
    xs = x.reshape(bp // bbr, bbr, L, J, C).transpose(2, 0, 3, 1, 4)
    return xs.reshape(L, bp * J, C), B


def from_slabs(ys: jnp.ndarray, B: int, J: int, bbr: int = BBR):
    """Inverse of :func:`to_slabs`: (L, ROWS, F) -> (B, L, J, F)."""
    L, rows, F = ys.shape
    gt = rows // (J * bbr)
    y = ys.reshape(L, gt, J, bbr, F).transpose(1, 3, 0, 2, 4)
    return y.reshape(gt * bbr, L, J, F)[:B]


def _dot(a, b, dims, cdtype):
    return jax.lax.dot_general(a.astype(cdtype), b.astype(cdtype),
                               (dims, ((), ())),
                               preferred_element_type=jnp.float32)


def _apply_groups(a, u, G, R, cdtype, dims=((1,), (0,))):
    """Per-group graph contraction: ``a`` (R, R) Kronecker constant applied
    to every (R, F) row-group of ``u`` (G*R, F). ``dims`` ((0,), (0,))
    applies aᵀ (the backward transpose) without materializing it."""
    return jnp.concatenate(
        [_dot(a, u[g * R:(g + 1) * R], dims, cdtype) for g in range(G)],
        axis=0)


def _gates_fwd(h, xg, a_ops, wzr, wh, k, G, R, H, cdtype):
    """Recompute-friendly GRU cell forward on (ROWS, ·) slabs: returns
    (z, r, rh, h_tilde) fp32 given the carry ``h`` and pre-activations
    ``xg`` (input-side conv + both biases, gate order z|r|h)."""
    hw = _dot(h, wzr, ((1,), (0,)), cdtype)             # (ROWS, k*2H)
    zr = xg[:, :2 * H].astype(jnp.float32) + hw[:, :2 * H]
    for n in range(1, k):
        zr = zr + _apply_groups(a_ops[n - 1],
                                hw[:, n * 2 * H:(n + 1) * 2 * H],
                                G, R, cdtype)
    z = jax.nn.sigmoid(zr[:, :H])
    r = jax.nn.sigmoid(zr[:, H:])
    rh = r * h
    vw = _dot(rh, wh, ((1,), (0,)), cdtype)             # (ROWS, k*H)
    ht = xg[:, 2 * H:].astype(jnp.float32) + vw[:, :H]
    for n in range(1, k):
        ht = ht + _apply_groups(a_ops[n - 1],
                                vw[:, n * H:(n + 1) * H], G, R, cdtype)
    return z, r, rh, jnp.tanh(ht)


def _fwd_kernel(*refs, k, G, R, H, cdtype):
    if k > 1:
        xg_ref, a_ref, wzr_ref, wh_ref, ys_ref, carry_ref = refs
        a_ops = [a_ref[n] for n in range(k - 1)]
    else:
        xg_ref, wzr_ref, wh_ref, ys_ref, carry_ref = refs
        a_ops = []

    @pl.when(pl.program_id(1) == 0)
    def _init():
        carry_ref[...] = jnp.zeros_like(carry_ref)

    h = carry_ref[...]
    z, _, _, ht = _gates_fwd(h, xg_ref[0], a_ops, wzr_ref[...], wh_ref[...],
                             k, G, R, H, cdtype)
    h_new = z * h + (1.0 - z) * ht
    carry_ref[...] = h_new
    ys_ref[0] = h_new.astype(ys_ref.dtype)


def _bwd_kernel(*refs, k, G, R, H, L, cdtype):
    if k > 1:
        (xg_ref, ysp_ref, dys_ref, a_ref, wzr_ref, wh_ref,
         dxg_ref, dwzr_ref, dwh_ref, dh_ref) = refs
        a_ops = [a_ref[n] for n in range(k - 1)]
    else:
        (xg_ref, ysp_ref, dys_ref, wzr_ref, wh_ref,
         dxg_ref, dwzr_ref, dwh_ref, dh_ref) = refs
        a_ops = []
    tr = pl.program_id(1)                   # frame = L-1-tr (reverse walk)

    @pl.when(tr == 0)
    def _init_carry():
        dh_ref[...] = jnp.zeros_like(dh_ref)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, tr == 0))
    def _init_weight_grads():
        dwzr_ref[...] = jnp.zeros_like(dwzr_ref)
        dwh_ref[...] = jnp.zeros_like(dwh_ref)

    wzr = wzr_ref[...]
    wh = wh_ref[...]
    # frame 0's previous hidden state is the zero init, not ys[-1]
    not_first_frame = (tr != L - 1).astype(jnp.float32)
    h_prev = ysp_ref[0].astype(jnp.float32) * not_first_frame
    z, r, rh, ht = _gates_fwd(h_prev, xg_ref[0], a_ops, wzr, wh,
                              k, G, R, H, cdtype)

    dh_t = dys_ref[0].astype(jnp.float32) + dh_ref[...]
    dz = dh_t * (h_prev - ht)
    dht = dh_t * (1.0 - z)
    dh_prev = dh_t * z
    da_h = dht * (1.0 - ht * ht)                        # (ROWS, H)
    dv = jnp.concatenate(
        [da_h] + [_apply_groups(a_ops[n - 1], da_h, G, R, cdtype,
                                ((0,), (0,)))
                  for n in range(1, k)], axis=1)        # (ROWS, k*H)
    drh = _dot(dv, wh, ((1,), (1,)), cdtype)            # (ROWS, H)
    dwh_ref[...] += _dot(rh, dv, ((0,), (0,)), cdtype)  # (H, k*H)
    dr = drh * h_prev
    dh_prev = dh_prev + drh * r
    da_zr = jnp.concatenate([dz * z * (1.0 - z), dr * r * (1.0 - r)], axis=1)
    du = jnp.concatenate(
        [da_zr] + [_apply_groups(a_ops[n - 1], da_zr, G, R, cdtype,
                                 ((0,), (0,)))
                   for n in range(1, k)], axis=1)       # (ROWS, k*2H)
    dh_prev = dh_prev + _dot(du, wzr, ((1,), (1,)), cdtype)
    dwzr_ref[...] += _dot(h_prev, du, ((0,), (0,)), cdtype)  # (H, k*2H)
    dh_ref[...] = dh_prev
    dxg_ref[0] = jnp.concatenate([da_zr, da_h], axis=1).astype(dxg_ref.dtype)


def _interpret():
    return jax.default_backend() != "tpu"


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def graph_gru_scan(xg, a_ops, wzr, wh, k: int, R: int, block_groups: int):
    """Fused graph-GRU frame recurrence on slab-layout pre-activations.

    :param xg: (L, ROWS, 3H) input-side gate pre-activations (gate order
        z|r|h) with BOTH biases folded in; ROWS = groups * R, row order
        (group, joint, batch-within-group) per :func:`to_slabs`.
    :param a_ops: (k-1, R, R) Kronecker graph constants
        (:func:`kron_cheb_ops`); ignored (pass a (0, R, R) array) for k = 1.
    :param wzr: (H, k*2H) hidden-side z|r weights, columns ordered
        (cheb order n, then z|r).
    :param wh: (H, k*H) hidden-side candidate weights, columns ordered by n.
    :param k: Chebyshev filter size (static).
    :param R: rows per group = J * BBR (static).
    :param block_groups: groups per grid block (static; must divide
        ROWS // R).
    :return: ys (L, ROWS, H) hidden states per frame, dtype of ``xg``.
    """
    ys, _ = _scan_fwd(xg, a_ops, wzr, wh, k, R, block_groups)
    return ys


def _scan_fwd(xg, a_ops, wzr, wh, k, R, block_groups):
    L, rows, f3 = xg.shape
    H = wh.shape[0]
    rb = block_groups * R
    grid = (rows // rb, L)

    def frame_spec(f):
        return pl.BlockSpec((1, rb, f), lambda i, t: (t, i, 0),
                            memory_space=pltpu.VMEM)

    const_specs = [
        pl.BlockSpec((k - 1, R, R), lambda i, t: (0, 0, 0),
                     memory_space=pltpu.VMEM)] if k > 1 else []
    const_specs += [
        pl.BlockSpec(wzr.shape, lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wh.shape, lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM)]
    args = (xg, a_ops, wzr, wh) if k > 1 else (xg, wzr, wh)
    ys = pl.pallas_call(
        functools.partial(_fwd_kernel, k=k, G=block_groups, R=R, H=H,
                          cdtype=xg.dtype),
        out_shape=jax.ShapeDtypeStruct((L, rows, H), xg.dtype),
        grid=grid,
        in_specs=[frame_spec(f3)] + const_specs,
        out_specs=frame_spec(H),
        scratch_shapes=[pltpu.VMEM((rb, H), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    return ys, (xg, a_ops, wzr, wh, ys)


def _scan_bwd(k, R, block_groups, res, dys):
    xg, a_ops, wzr, wh, ys = res
    L, rows, f3 = xg.shape
    H = wh.shape[0]
    rb = block_groups * R
    grid = (rows // rb, L)

    def rev_spec(f):
        return pl.BlockSpec((1, rb, f), lambda i, t: (L - 1 - t, i, 0),
                            memory_space=pltpu.VMEM)

    def prev_spec(f):
        return pl.BlockSpec(
            (1, rb, f), lambda i, t: (jnp.maximum(L - 2 - t, 0), i, 0),
            memory_space=pltpu.VMEM)

    const_specs = [
        pl.BlockSpec((k - 1, R, R), lambda i, t: (0, 0, 0),
                     memory_space=pltpu.VMEM)] if k > 1 else []
    const_specs += [
        pl.BlockSpec(wzr.shape, lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(wh.shape, lambda i, t: (0, 0),
                     memory_space=pltpu.VMEM)]
    const_out = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    args = ((xg, ys, dys, a_ops, wzr, wh) if k > 1
            else (xg, ys, dys, wzr, wh))
    dxg, dwzr, dwh = pl.pallas_call(
        functools.partial(_bwd_kernel, k=k, G=block_groups, R=R, H=H, L=L,
                          cdtype=xg.dtype),
        out_shape=(jax.ShapeDtypeStruct(xg.shape, xg.dtype),
                   jax.ShapeDtypeStruct(wzr.shape, jnp.float32),
                   jax.ShapeDtypeStruct(wh.shape, jnp.float32)),
        grid=grid,
        in_specs=[rev_spec(f3), prev_spec(H), rev_spec(H)] + const_specs,
        out_specs=(rev_spec(f3),
                   const_out(wzr.shape, lambda i, t: (0, 0)),
                   const_out(wh.shape, lambda i, t: (0, 0))),
        scratch_shapes=[pltpu.VMEM((rb, H), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    return (dxg, jnp.zeros_like(a_ops), dwzr.astype(wzr.dtype),
            dwh.astype(wh.dtype))


graph_gru_scan.defvjp(_scan_fwd, _scan_bwd)


# ---------------------------------------------------------------------------
# GConvLSTM: same slab layout and grid, one fused i|f|c|o gate group. The
# forward emits BOTH h and c per frame (c is needed to recompute gates in the
# reverse walk — unlike the GRU, the LSTM carry is not recoverable from the
# emitted hidden states alone).
# ---------------------------------------------------------------------------


def _lstm_gates_fwd(h, xg, a_ops, w, k, G, R, H, cdtype):
    """(i, f, g, o) fp32 given carry ``h`` and pre-activations ``xg``
    (input-side conv + both biases, gate order i|f|c|o)."""
    hw = _dot(h, w, ((1,), (0,)), cdtype)               # (ROWS, k*4H)
    acts = xg.astype(jnp.float32) + hw[:, :4 * H]
    for n in range(1, k):
        acts = acts + _apply_groups(a_ops[n - 1],
                                    hw[:, n * 4 * H:(n + 1) * 4 * H],
                                    G, R, cdtype)
    return (jax.nn.sigmoid(acts[:, :H]), jax.nn.sigmoid(acts[:, H:2 * H]),
            jnp.tanh(acts[:, 2 * H:3 * H]), jax.nn.sigmoid(acts[:, 3 * H:]))


def _lstm_fwd_kernel(*refs, k, G, R, H, cdtype):
    if k > 1:
        xg_ref, a_ref, w_ref, ys_ref, cs_ref, h_ref, c_ref = refs
        a_ops = [a_ref[n] for n in range(k - 1)]
    else:
        xg_ref, w_ref, ys_ref, cs_ref, h_ref, c_ref = refs
        a_ops = []

    @pl.when(pl.program_id(1) == 0)
    def _init():
        h_ref[...] = jnp.zeros_like(h_ref)
        c_ref[...] = jnp.zeros_like(c_ref)

    h, c = h_ref[...], c_ref[...]
    i, f, g, o = _lstm_gates_fwd(h, xg_ref[0], a_ops, w_ref[...],
                                 k, G, R, H, cdtype)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    h_ref[...] = h_new
    c_ref[...] = c_new
    ys_ref[0] = h_new.astype(ys_ref.dtype)
    cs_ref[0] = c_new.astype(cs_ref.dtype)


def _lstm_bwd_kernel(*refs, k, G, R, H, L, cdtype, with_dcs):
    refs = list(refs)
    xg_ref, ysp_ref, csp_ref, cs_ref, dys_ref = refs[:5]
    rest = refs[5:]
    dcs_ref = rest.pop(0) if with_dcs else None
    a_ops = [rest[0][n] for n in range(k - 1)] if k > 1 else []
    if k > 1:
        rest = rest[1:]
    w_ref, dxg_ref, dw_ref, dh_ref, dc_ref = rest
    tr = pl.program_id(1)                   # frame = L-1-tr (reverse walk)

    @pl.when(tr == 0)
    def _init_carry():
        dh_ref[...] = jnp.zeros_like(dh_ref)
        dc_ref[...] = jnp.zeros_like(dc_ref)

    @pl.when(jnp.logical_and(pl.program_id(0) == 0, tr == 0))
    def _init_weight_grads():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    w = w_ref[...]
    not_first_frame = (tr != L - 1).astype(jnp.float32)
    h_prev = ysp_ref[0].astype(jnp.float32) * not_first_frame
    c_prev = csp_ref[0].astype(jnp.float32) * not_first_frame
    i, f, g, o = _lstm_gates_fwd(h_prev, xg_ref[0], a_ops, w,
                                 k, G, R, H, cdtype)
    tc = jnp.tanh(cs_ref[0].astype(jnp.float32))

    dh_t = dys_ref[0].astype(jnp.float32) + dh_ref[...]
    do = dh_t * tc
    dc_t = dh_t * o * (1.0 - tc * tc) + dc_ref[...]
    if with_dcs:
        dc_t = dc_t + dcs_ref[0].astype(jnp.float32)
    di = dc_t * g
    df = dc_t * c_prev
    dg = dc_t * i
    dc_ref[...] = dc_t * f
    da = jnp.concatenate([di * i * (1.0 - i), df * f * (1.0 - f),
                          dg * (1.0 - g * g), do * o * (1.0 - o)], axis=1)
    du = jnp.concatenate(
        [da] + [_apply_groups(a_ops[n - 1], da, G, R, cdtype, ((0,), (0,)))
                for n in range(1, k)], axis=1)           # (ROWS, k*4H)
    dh_ref[...] = _dot(du, w, ((1,), (1,)), cdtype)
    dw_ref[...] += _dot(h_prev, du, ((0,), (0,)), cdtype)  # (H, k*4H)
    dxg_ref[0] = da.astype(dxg_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def graph_lstm_scan(xg, a_ops, w, k: int, R: int, block_groups: int,
                    with_c: bool = False):
    """Fused graph-LSTM frame recurrence on slab-layout pre-activations.

    :param xg: (L, ROWS, 4H) input-side gate pre-activations (gate order
        i|f|c|o) with BOTH biases folded in (layout per :func:`to_slabs`).
    :param a_ops: (k-1, R, R) Kronecker graph constants
        (:func:`kron_cheb_ops`); pass a (0, R, R) array for k = 1 — which
        makes this a plain dense LSTM scan (used by
        :class:`models.rnn.HoistedLSTM`'s TPU path).
    :param w: (H, k*4H) hidden-side weights, columns ordered
        (cheb order n, then i|f|c|o within each n block).
    :param with_c: also return the cell-state sequence (for final-carry
        consumers); both outputs are differentiable.
    :return: ys (L, ROWS, H) hidden states per frame, dtype of ``xg``
        (``(ys, cs)`` when ``with_c``).
    """
    out, _ = _lstm_scan_fwd(xg, a_ops, w, k, R, block_groups, with_c)
    return out


def _lstm_scan_fwd(xg, a_ops, w, k, R, block_groups, with_c=False):
    L, rows, _ = xg.shape
    H = w.shape[0]
    rb = block_groups * R
    grid = (rows // rb, L)

    def frame_spec(f):
        return pl.BlockSpec((1, rb, f), lambda i, t: (t, i, 0),
                            memory_space=pltpu.VMEM)

    const_specs = [
        pl.BlockSpec((k - 1, R, R), lambda i, t: (0, 0, 0),
                     memory_space=pltpu.VMEM)] if k > 1 else []
    const_specs += [pl.BlockSpec(w.shape, lambda i, t: (0, 0),
                                 memory_space=pltpu.VMEM)]
    args = (xg, a_ops, w) if k > 1 else (xg, w)
    ys, cs = pl.pallas_call(
        functools.partial(_lstm_fwd_kernel, k=k, G=block_groups, R=R, H=H,
                          cdtype=xg.dtype),
        out_shape=(jax.ShapeDtypeStruct((L, rows, H), xg.dtype),
                   jax.ShapeDtypeStruct((L, rows, H), xg.dtype)),
        grid=grid,
        in_specs=[frame_spec(4 * H)] + const_specs,
        out_specs=(frame_spec(H), frame_spec(H)),
        scratch_shapes=[pltpu.VMEM((rb, H), jnp.float32),
                        pltpu.VMEM((rb, H), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    return (ys, cs) if with_c else ys, (xg, a_ops, w, ys, cs)


def _lstm_scan_bwd(k, R, block_groups, with_c, res, ct):
    xg, a_ops, w, ys, cs = res
    dys, dcs = ct if with_c else (ct, None)
    L, rows, f4 = xg.shape
    H = w.shape[0]
    rb = block_groups * R
    grid = (rows // rb, L)

    def rev_spec(f):
        return pl.BlockSpec((1, rb, f), lambda i, t: (L - 1 - t, i, 0),
                            memory_space=pltpu.VMEM)

    def prev_spec(f):
        return pl.BlockSpec(
            (1, rb, f), lambda i, t: (jnp.maximum(L - 2 - t, 0), i, 0),
            memory_space=pltpu.VMEM)

    const_specs = [
        pl.BlockSpec((k - 1, R, R), lambda i, t: (0, 0, 0),
                     memory_space=pltpu.VMEM)] if k > 1 else []
    const_specs += [pl.BlockSpec(w.shape, lambda i, t: (0, 0),
                                 memory_space=pltpu.VMEM)]
    args = (xg, ys, cs, cs, dys)
    in_specs = [rev_spec(f4), prev_spec(H), prev_spec(H), rev_spec(H),
                rev_spec(H)]
    if with_c:
        args += (dcs,)
        in_specs.append(rev_spec(H))
    args += (a_ops, w) if k > 1 else (w,)
    dxg, dw = pl.pallas_call(
        functools.partial(_lstm_bwd_kernel, k=k, G=block_groups, R=R, H=H,
                          L=L, cdtype=xg.dtype, with_dcs=with_c),
        out_shape=(jax.ShapeDtypeStruct(xg.shape, xg.dtype),
                   jax.ShapeDtypeStruct(w.shape, jnp.float32)),
        grid=grid,
        in_specs=in_specs + const_specs,
        out_specs=(rev_spec(f4),
                   pl.BlockSpec(w.shape, lambda i, t: (0, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((rb, H), jnp.float32),
                        pltpu.VMEM((rb, H), jnp.float32)],
        interpret=_interpret(),
    )(*args)
    return dxg, jnp.zeros_like(a_ops), dw.astype(w.dtype)


graph_lstm_scan.defvjp(_lstm_scan_fwd, _lstm_scan_bwd)


def pick_block_groups(total_groups: int, target: int = 8) -> int:
    """Largest divisor of ``total_groups`` that is <= ``target`` (grid
    blocks must tile the group dimension exactly). target=8 (832 rows/block)
    keeps the backward's five live (rows, 3H|H) slabs ~9.5 MB at H=128 —
    16 groups exceeds the 16 MB scoped-VMEM limit (measured: 18.99M)."""
    bg = min(target, total_groups)
    while total_groups % bg:
        bg -= 1
    return bg
