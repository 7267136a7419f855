"""Fused small-token transformer stack as ONE Pallas TPU kernel — built for
PoseFormer's *spatial* stage (J=26 joint tokens of emb=32 per frame).

Why: with token-major (N, 26, 32) activations every intermediate pads
26->32 sublanes and 32->128 lanes (4-16x HBM waste), every dense is a K=32
sliver of the MXU, and XLA round-trips each of the ~30 ops per block through
HBM. Slope-timed on the real chip (tools/poseformer_stage_probe.py with the
queue-drain methodology of tools/spatial_stage_probe.py): the 4-block spatial
stack costs 29 ms forward / 98 ms forward+backward of PoseFormer's ~164 ms
B1024 bf16 train step — ~60% of the step for ~7% of the FLOPs, at 0.8% MFU.

The kernel holds a block of frames in VMEM through ALL depth blocks + the
final LayerNorm: per-frame working set is ~20 KB, the whole stack's weights
are ~70 KB, so HBM traffic collapses to one unpadded read + write of the
activations. The backward is hand-written (same grid): it recomputes the
per-block intermediates in VMEM from the saved block *input* (flash-style
recompute) and accumulates weight gradients across sequential grid steps
into constant-index-map outputs.

Math parity: exactly the flax stack in ``models/movements/pose_former.py``
(``_Block`` x depth + ``spatial_norm``): LayerNorm eps 1e-5 with fp32 stats
(flax upcasts too), erf-gelu via XLA's own f32 rational approximation
(coefficients from xla/client/lib/math.cc ErfImpl32 — the spike matched
``jax.nn.gelu(approximate=False)`` to 2.5e-6), fp32 softmax. Dropout is not
implemented — callers must route drop_rate>0 training through the XLA path.

Reference: the reimplemented third-party PoseFormer (see
``pose_former.py:17-138`` in the upstream repo) has no TPU analogue — this
kernel is the TPU-native replacement for its per-window torch module loop.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LN_EPS = 1e-5
BLOCK_N = 128  # frames per grid step (lane width)

#: weight-tuple layout (all stacked over depth D; biases 2-D):
#: (ln1_s (D,E), ln1_b (D,E), qkv_w (D,E,3E), qkv_b (D,3E),
#:  proj_w (D,E,E), proj_b (D,E), ln2_s (D,E), ln2_b (D,E),
#:  fc1_w (D,E,MLP), fc1_b (D,MLP), fc2_w (D,MLP,E), fc2_b (D,E),
#:  lnf_s (1,E), lnf_b (1,E))
NUM_WEIGHTS = 14


def _erf(x):
    """XLA's f32 erf: x*P(x2)/Q(x2) clamped at erfinv(1-2^-23)
    (xla/client/lib/math.cc ErfImpl32); Mosaic has no erf primitive."""
    ka = (0.00022905065861350646, 0.0034082910107109506,
          0.050955695062380861, 0.18520832239976145, 1.128379143519084)
    kb = (-1.1791602954361697e-07, 2.3547966471313185e-05,
          0.0010179625278914885, 0.014070470171167667, 0.11098505178285362,
          0.49746925110067538, 1.0)
    x = jnp.clip(x, -3.832506856900711, 3.832506856900711)
    x2 = x * x
    p = ka[0]
    for c in ka[1:]:
        p = p * x2 + c
    q = kb[0]
    for c in kb[1:]:
        q = q * x2 + c
    return x * p / q


_INV_SQRT2 = 0.7071067811865476
_INV_SQRT_2PI = 0.3989422804014327


def _gelu(x):
    return 0.5 * x * (1.0 + _erf(x * _INV_SQRT2))


def _dgelu(x):
    """d/dx of erf-gelu: Phi(x) + x * phi(x)."""
    cdf = 0.5 * (1.0 + _erf(x * _INV_SQRT2))
    pdf = jnp.exp(-0.5 * x * x) * _INV_SQRT_2PI
    return cdf + x * pdf


def _ln_fwd(x32, s, b):
    """LayerNorm over axis 0 (features) of (E, M) fp32; returns
    (y_unscaled xh, inv, y) with flax's max(var, 0) clamp."""
    mu = jnp.mean(x32, axis=0, keepdims=True)
    var = jnp.maximum(
        jnp.mean(x32 * x32, axis=0, keepdims=True) - mu * mu, 0.0)
    inv = jax.lax.rsqrt(var + LN_EPS)
    xh = (x32 - mu) * inv
    return xh, inv, xh * s + b


def _ln_bwd(dy, xh, inv, s):
    """Input-gradient of :func:`_ln_fwd` (dy, xh fp32 (E, M))."""
    dxh = dy * s
    m1 = jnp.mean(dxh, axis=0, keepdims=True)
    m2 = jnp.mean(dxh * xh, axis=0, keepdims=True)
    return inv * (dxh - m1 - xh * m2)


def _dense(w, b, x, cdtype):
    """y = w^T @ x + b on (E_in, M) slabs; fp32 accumulate, ``cdtype``
    operands (bf16 operands hit the MXU at full rate)."""
    out = jax.lax.dot_general(
        w.astype(cdtype), x.astype(cdtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    # cast BEFORE the (E,) -> (E, 1) reshape: Mosaic only supports
    # inserting a minor dim on 32-bit types
    return out + jnp.reshape(b.astype(jnp.float32), (b.shape[0], 1))


def _attn_fwd(qkv, num_heads, J, BB):
    """qkv: (3E, J, BB) fp32 -> (o (E, J*BB), probs per head list)."""
    E = qkv.shape[0] // 3
    HD = E // num_heads
    scale = float(HD) ** -0.5
    outs = []
    probs = []
    for h in range(num_heads):
        s = jnp.zeros((J, J, BB), jnp.float32)
        for d in range(HD):
            qs = qkv[h * HD + d] * scale
            kh = qkv[E + h * HD + d]
            s = s + qs[:, None, :] * kh[None, :, :]
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=1, keepdims=True)
        probs.append(p)
        for d in range(HD):
            vh = qkv[2 * E + h * HD + d]
            outs.append(jnp.sum(p * vh[None, :, :], axis=1))
    o = jnp.stack(outs, axis=0)          # (E, J, BB)
    return o.reshape(E, J * BB), probs


def _attn_bwd(do, qkv, num_heads, J, BB, probs=None):
    """do: (E, J*BB) fp32 -> dqkv (3E, J*BB) fp32. ``probs``: the forward
    sweep's per-head probability list — the whole-stack backward kernel
    keeps it in VMEM (r4), which removes the score/softmax recompute here
    (~1x the forward attention VPU work, and attention dominates this
    layout-bound stage). Without it the probabilities are recomputed ONE
    HEAD AT A TIME (keeping all heads' probs live overflowed the 16 MB
    scoped-VMEM default at BB=128 before the limit was raised)."""
    E = qkv.shape[0] // 3
    HD = E // num_heads
    scale = float(HD) ** -0.5
    do3 = do.reshape(E, J, BB)
    dq_rows = [None] * E
    dk_rows = [None] * E
    dv_rows = [None] * E
    for h in range(num_heads):
        if probs is not None:
            p = probs[h]
        else:
            s = jnp.zeros((J, J, BB), jnp.float32)
            for d in range(HD):
                qs = qkv[h * HD + d] * scale
                kh = qkv[E + h * HD + d]
                s = s + qs[:, None, :] * kh[None, :, :]
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            p = e / jnp.sum(e, axis=1, keepdims=True)
        dp = jnp.zeros((J, J, BB), jnp.float32)
        for d in range(HD):
            do_hd = do3[h * HD + d]
            vh = qkv[2 * E + h * HD + d]
            dp = dp + do_hd[:, None, :] * vh[None, :, :]
            dv_rows[h * HD + d] = jnp.sum(p * do_hd[:, None, :], axis=0)
        ds = p * (dp - jnp.sum(dp * p, axis=1, keepdims=True))
        for d in range(HD):
            qs = qkv[h * HD + d] * scale
            kh = qkv[E + h * HD + d]
            dq_rows[h * HD + d] = scale * jnp.sum(
                ds * kh[None, :, :], axis=1)
            dk_rows[h * HD + d] = jnp.sum(ds * qs[:, None, :], axis=0)
    dqkv = jnp.stack(dq_rows + dk_rows + dv_rows, axis=0)   # (3E, J, BB)
    return dqkv.reshape(3 * E, J * BB)


def _block_fwd(x, wd, num_heads, J, BB, cdtype, attn_fwd=None,
               res_dtype=None, keep_probs=False):
    """One transformer block on (E, M) slabs. ``x`` fp32; ``wd`` the
    per-depth weight dict. Returns (x_next fp32, residuals dict).
    ``attn_fwd`` lets callers swap the attention inner loop (the fused
    temporal kernel uses a head-batched variant; default is this module's
    per-head/per-dim spatial formulation). ``res_dtype`` stores the large
    residual slabs in that dtype (the temporal kernel passes the compute
    dtype to halve the backward's VMEM live set; default keeps fp32).
    ``keep_probs`` adds the attention probabilities to the residuals so
    the backward sweep skips the score/softmax recompute."""
    E = x.shape[0]
    rd = res_dtype or jnp.float32
    xh1, inv1, y1 = _ln_fwd(x, wd["ln1_s"], wd["ln1_b"])
    qkv = _dense(wd["qkv_w"], wd["qkv_b"], y1, cdtype)      # (3E, M) f32
    qkv3 = qkv.reshape(3 * E, J, BB)
    o, probs = (attn_fwd or _attn_fwd)(qkv3, num_heads, J, BB)
    a = _dense(wd["proj_w"], wd["proj_b"], o, cdtype)
    x2 = x + a
    xh2, inv2, y2 = _ln_fwd(x2, wd["ln2_s"], wd["ln2_b"])
    h = _dense(wd["fc1_w"], wd["fc1_b"], y2, cdtype)        # (MLP, M)
    g = _gelu(h)
    u = _dense(wd["fc2_w"], wd["fc2_b"], g, cdtype)
    x3 = x2 + u
    res = dict(xh1=xh1.astype(rd), inv1=inv1, y1=y1.astype(rd),
               qkv3=qkv3.astype(rd), o=o.astype(rd),
               xh2=xh2.astype(rd), inv2=inv2, y2=y2.astype(rd),
               h=h.astype(rd), g=g.astype(rd))
    if keep_probs and probs is not None:
        res["probs"] = probs
    return x3, res


def _block_bwd(dx3, x_in, wd, res, num_heads, J, BB, attn_bwd=None,
               cdtype=jnp.float32):
    """Reverse of :func:`_block_fwd`; fp32 accumulation throughout.
    ``attn_bwd`` swaps the attention backward to match ``_block_fwd``'s
    ``attn_fwd``. ``cdtype`` is the dtype of every dot operand (the
    temporal kernel passes bf16 so the backward matmuls hit the MXU at
    full rate, matching XLA's own AMP backward; the default keeps the
    spatial kernel's fp32 dots — its stage is layout-bound, not
    FLOP-bound, and fp32 there is free precision)."""
    E = x_in.shape[0]
    M = x_in.shape[1]
    f32 = jnp.float32

    def dot_dx(w, g):       # (in, out) x (out, M) -> (in, M)
        return jax.lax.dot_general(w.astype(cdtype), g.astype(cdtype),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def dot_dw(act, g):     # (in, M) x (out, M) -> (in, out)
        return jax.lax.dot_general(act.astype(cdtype), g.astype(cdtype),
                                   (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    dW = {}
    # x3 = x2 + u
    du = dx3
    dx2 = dx3
    # u = fc2(g)
    dg = dot_dx(wd["fc2_w"], du)
    dW["fc2_w"] = dot_dw(res["g"], du)
    dW["fc2_b"] = jnp.sum(du, axis=1)
    # g = gelu(h)
    dh = dg * _dgelu(res["h"].astype(f32))
    # h = fc1(y2)
    dy2 = dot_dx(wd["fc1_w"], dh)
    dW["fc1_w"] = dot_dw(res["y2"], dh)
    dW["fc1_b"] = jnp.sum(dh, axis=1)
    # y2 = LN2(x2) * s + b
    xh2 = res["xh2"].astype(f32)
    dW["ln2_s"] = jnp.sum(dy2 * xh2, axis=1)
    dW["ln2_b"] = jnp.sum(dy2, axis=1)
    dx2 = dx2 + _ln_bwd(dy2, xh2, res["inv2"], wd["ln2_s"])
    # x2 = x + a
    da = dx2
    dx = dx2
    # a = proj(o)
    do = dot_dx(wd["proj_w"], da)
    dW["proj_w"] = dot_dw(res["o"], da)
    dW["proj_b"] = jnp.sum(da, axis=1)
    # attention (forward-sweep probs reused when the residuals carry them)
    if attn_bwd is not None:
        dqkv = attn_bwd(do, res["qkv3"], num_heads, J, BB)
    else:
        dqkv = _attn_bwd(do, res["qkv3"], num_heads, J, BB,
                         probs=res.get("probs"))
    # qkv = qkv_w(y1)
    dy1 = dot_dx(wd["qkv_w"], dqkv)
    dW["qkv_w"] = dot_dw(res["y1"], dqkv)
    dW["qkv_b"] = jnp.sum(dqkv, axis=1)
    # y1 = LN1(x) * s + b
    xh1 = res["xh1"].astype(f32)
    dW["ln1_s"] = jnp.sum(dy1 * xh1, axis=1)
    dW["ln1_b"] = jnp.sum(dy1, axis=1)
    dx = dx + _ln_bwd(dy1, xh1, res["inv1"], wd["ln1_s"])
    return dx, dW


def _weights_at(refs, d):
    """Per-depth weight dict (fp32) from the stacked weight refs."""
    (ln1_s, ln1_b, qkv_w, qkv_b, proj_w, proj_b,
     ln2_s, ln2_b, fc1_w, fc1_b, fc2_w, fc2_b, _, _) = refs
    f = jnp.float32
    return dict(
        ln1_s=jnp.reshape(ln1_s[d].astype(f), (-1, 1)),
        ln1_b=jnp.reshape(ln1_b[d].astype(f), (-1, 1)),
        qkv_w=qkv_w[d], qkv_b=qkv_b[d],
        proj_w=proj_w[d], proj_b=proj_b[d],
        ln2_s=jnp.reshape(ln2_s[d].astype(f), (-1, 1)),
        ln2_b=jnp.reshape(ln2_b[d].astype(f), (-1, 1)),
        fc1_w=fc1_w[d], fc1_b=fc1_b[d],
        fc2_w=fc2_w[d], fc2_b=fc2_b[d])


def _fwd_kernel(x_ref, *refs, num_heads):
    w_refs, out_ref = refs[:NUM_WEIGHTS], refs[NUM_WEIGHTS]
    E, J, BB = x_ref.shape
    depth = w_refs[2].shape[0]
    cdtype = x_ref.dtype
    x = x_ref[:].reshape(E, J * BB).astype(jnp.float32)
    for d in range(depth):
        wd = _weights_at(w_refs, d)
        x, _ = _block_fwd(x, wd, num_heads, J, BB, cdtype)
    lnf_s = jnp.reshape(w_refs[12][0].astype(jnp.float32), (-1, 1))
    lnf_b = jnp.reshape(w_refs[13][0].astype(jnp.float32), (-1, 1))
    _, _, y = _ln_fwd(x, lnf_s, lnf_b)
    out_ref[:] = y.astype(cdtype).reshape(E, J, BB)


def _bwd_kernel(x_ref, *refs, num_heads):
    w_refs = refs[:NUM_WEIGHTS]
    g_ref = refs[NUM_WEIGHTS]
    dx_ref = refs[NUM_WEIGHTS + 1]
    dw_refs = refs[NUM_WEIGHTS + 2:]
    E, J, BB = x_ref.shape
    depth = w_refs[2].shape[0]
    cdtype = x_ref.dtype

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for ref in dw_refs:
            ref[...] = jnp.zeros_like(ref)

    # forward sweep: keep each block's input AND residuals — at E=32 the
    # whole stack's fp32 residuals are ~25 MB of VMEM, so the reverse sweep
    # needs no per-block forward recompute (the recompute was ~1 extra full
    # forward per grid step, ~27% of this kernel's time)
    x = x_ref[:].reshape(E, J * BB).astype(jnp.float32)
    xs = []
    ress = []
    for d in range(depth):
        xs.append(x)
        wd = _weights_at(w_refs, d)
        x, res = _block_fwd(x, wd, num_heads, J, BB, cdtype,
                            keep_probs=True)
        ress.append(res)

    # final LayerNorm backward
    lnf_s = jnp.reshape(w_refs[12][0].astype(jnp.float32), (-1, 1))
    lnf_b = jnp.reshape(w_refs[13][0].astype(jnp.float32), (-1, 1))
    xhf, invf, _ = _ln_fwd(x, lnf_s, lnf_b)
    g = g_ref[:].reshape(E, J * BB).astype(jnp.float32)
    dw_refs[12][...] += jnp.sum(g * xhf, axis=1)[None, :].astype(
        dw_refs[12].dtype)
    dw_refs[13][...] += jnp.sum(g, axis=1)[None, :].astype(dw_refs[13].dtype)
    dx = _ln_bwd(g, xhf, invf, lnf_s)

    # reverse sweep with per-block recompute
    order = ("ln1_s", "ln1_b", "qkv_w", "qkv_b", "proj_w", "proj_b",
             "ln2_s", "ln2_b", "fc1_w", "fc1_b", "fc2_w", "fc2_b")
    for d in range(depth - 1, -1, -1):
        wd = _weights_at(w_refs, d)
        dx, dW = _block_bwd(dx, xs[d], wd, ress[d], num_heads, J, BB)
        for wi, name in enumerate(order):
            ref = dw_refs[wi]
            contrib = dW[name].astype(ref.dtype)
            if ref.ndim == 2:  # (D, out) bias/scale grads
                ref[d:d + 1, :] += contrib[None, :]
            else:              # (D, in, out) kernel grads
                ref[d:d + 1] += contrib[None]

    dx_ref[:] = dx.astype(cdtype).reshape(E, J, BB)


def _block_n(n):
    if jax.default_backend() != "tpu":
        return max(8, int(np.ceil(n / 8)) * 8) if n < BLOCK_N else BLOCK_N
    return BLOCK_N


def _prep(x, block_n):
    """(N, J, E) token-major -> padded (E, J, Np) slabs."""
    n = x.shape[0]
    pad = (-n) % block_n
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0)
    return jnp.transpose(x, (2, 1, 0)), n + pad


def _w_spec(w):
    return pl.BlockSpec(w.shape, lambda i: (0,) * w.ndim,
                        memory_space=pltpu.VMEM)


def _x_spec(E, J, BB):
    return pl.BlockSpec((E, J, BB), lambda i: (0, 0, i),
                        memory_space=pltpu.VMEM)


def _fused_fwd_impl(x, weights, num_heads):
    N, J, E = x.shape
    bn = _block_n(N)
    xt, Np = _prep(x, bn)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, num_heads=num_heads),
        out_shape=jax.ShapeDtypeStruct((E, J, Np), x.dtype),
        grid=(Np // bn,),
        in_specs=[_x_spec(E, J, bn)] + [_w_spec(w) for w in weights],
        out_specs=_x_spec(E, J, bn),
        interpret=jax.default_backend() != "tpu",
    )(xt, *weights)
    return jnp.transpose(out, (2, 1, 0))[:N]


def _fused_bwd_impl(x, weights, g, num_heads):
    N, J, E = x.shape
    bn = _block_n(N)
    xt, Np = _prep(x, bn)
    gt, _ = _prep(g, bn)
    dw_shapes = [jax.ShapeDtypeStruct(w.shape, jnp.float32) for w in weights]
    dx, *dws = pl.pallas_call(
        functools.partial(_bwd_kernel, num_heads=num_heads),
        out_shape=[jax.ShapeDtypeStruct((E, J, Np), x.dtype)] + dw_shapes,
        grid=(Np // bn,),
        in_specs=[_x_spec(E, J, bn)] + [_w_spec(w) for w in weights]
        + [_x_spec(E, J, bn)],
        out_specs=[_x_spec(E, J, bn)] + [_w_spec(w) for w in weights],
        # the reverse sweep's per-block recompute peaks above the 16 MB
        # scoped-VMEM default at BB=128 fp32; v5e physical VMEM is far
        # larger — raise the scoped limit for this kernel only
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(xt, *weights, gt)
    dx = jnp.transpose(dx, (2, 1, 0))[:N]
    dws = tuple(dw.astype(w.dtype) for dw, w in zip(dws, weights))
    return dx, dws


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def fused_spatial_stack(x, weights, num_heads):
    """depth x (LN -> MHA -> LN -> MLP) + final LayerNorm, fused.

    x: (N, J, E) token-major; weights: the 14-tuple documented at the top
    of this module (stacked over depth, same dtype as x for full-rate MXU
    bf16). Differentiable in x and every weight (hand-written Pallas
    backward). Exact flax-stack math except dropout (unsupported — gate at
    the caller)."""
    return _fused_fwd_impl(x, weights, num_heads)


def _vjp_fwd(x, weights, num_heads):
    return _fused_fwd_impl(x, weights, num_heads), (x, weights)


def _vjp_bwd(num_heads, residuals, g):
    x, weights = residuals
    return _fused_bwd_impl(x, weights, g, num_heads)


fused_spatial_stack.defvjp(_vjp_fwd, _vjp_bwd)


def spatial_stack_reference(x, weights, num_heads):
    """Pure-XLA mirror of the kernel math (numerical oracle for tests)."""
    N, J, E = x.shape
    xt = jnp.transpose(x, (2, 1, 0)).reshape(E, J * N).astype(jnp.float32)
    depth = weights[2].shape[0]
    cdtype = x.dtype
    refs = weights
    for d in range(depth):
        wd = _weights_at(refs, d)
        xt, _ = _block_fwd(xt, wd, num_heads, J, N, cdtype)
    lnf_s = jnp.reshape(refs[12][0].astype(jnp.float32), (-1, 1))
    lnf_b = jnp.reshape(refs[13][0].astype(jnp.float32), (-1, 1))
    _, _, y = _ln_fwd(xt, lnf_s, lnf_b)
    y = y.astype(cdtype).reshape(E, J, N)
    return jnp.transpose(y, (2, 1, 0))
