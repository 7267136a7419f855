"""Probe 3: can the PoseFormer *spatial* stage be reformulated to stop
wasting the MXU?

Stage probe 2 measured the spatial stack at 32 ms fwd / 107 ms fwd+bwd of the
272 ms B1024 bf16 train step — 40% of the step for ~7% of the FLOPs. Causes:
every dense is K=32 (25% MXU contraction fill), every activation's minor dim
is 32 (lanes pad 32->128, 4x HBM waste) and J=26 pads sublanes 26->32.

Variants (all EXACT same math + the SAME (32, x) weight tensors, so torch
checkpoint import parity is untouched):
  V0 baseline    — token-major (B*L, 26, 32), as shipped.
  V1 folded      — frame as ONE 832-vector; dense layers become block-diagonal
                   (832, 26*out) matmuls built from the shared (32, out) weight
                   under jit (full K tiles, full lanes; 26x redundant MACs are
                   free at 0.4% MFU). Attention still reshapes to heads.
  V2 batch-minor — component-plane style: activations live as (J, K, N) with
                   the huge batch dim minor-most (lanes always full), all ops
                   einsums, no (…, 32) minor dims anywhere.

PYTHONPATH=/root/repo:/root/.axon_site python tools/spatial_stage_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

N, J, EMB, H, DEPTH = 16384, 26, 32, 8, 4
HD = EMB // H
MLP = EMB * 2
DTYPE = jnp.bfloat16
LN_EPS = 1e-5


def timed(fn, *args, steps=10, bursts=3, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = float("inf")
    for _ in range(bursts):
        t0 = time.perf_counter()
        for _ in range(steps):
            out = fn(*args)
        jax.block_until_ready(out)
        dt = min(dt, time.perf_counter() - t0)
    return dt / steps * 1e3


def make_params(key):
    ks = jax.random.split(key, DEPTH * 8)
    p = []
    for i in range(DEPTH):
        k = ks[i * 8:(i + 1) * 8]
        p.append(dict(
            ln1_s=jnp.ones((EMB,), DTYPE), ln1_b=jnp.zeros((EMB,), DTYPE),
            qkv_w=jax.random.normal(k[0], (EMB, 3 * EMB), DTYPE) * 0.05,
            qkv_b=jnp.zeros((3 * EMB,), DTYPE),
            proj_w=jax.random.normal(k[1], (EMB, EMB), DTYPE) * 0.05,
            proj_b=jnp.zeros((EMB,), DTYPE),
            ln2_s=jnp.ones((EMB,), DTYPE), ln2_b=jnp.zeros((EMB,), DTYPE),
            fc1_w=jax.random.normal(k[2], (EMB, MLP), DTYPE) * 0.05,
            fc1_b=jnp.zeros((MLP,), DTYPE),
            fc2_w=jax.random.normal(k[3], (MLP, EMB), DTYPE) * 0.05,
            fc2_b=jnp.zeros((EMB,), DTYPE),
        ))
    return p


def ln(x, s, b, axis=-1):
    m = jnp.mean(x, axis=axis, keepdims=True)
    v = jnp.mean(jnp.square(x - m), axis=axis, keepdims=True)
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    return (x - m) * jax.lax.rsqrt(v + LN_EPS) * s.reshape(shape) \
        + b.reshape(shape)


# ------------------------------------------------------------- V0 baseline
def block_v0(x, p):
    y = ln(x, p["ln1_s"], p["ln1_b"])
    qkv = (y @ p["qkv_w"] + p["qkv_b"]).reshape(N, J, 3, H, HD)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q * (HD ** -0.5), k), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(N, J, EMB)
    x = x + (o @ p["proj_w"] + p["proj_b"])
    y = ln(x, p["ln2_s"], p["ln2_b"])
    y = jax.nn.gelu(y @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + (y @ p["fc2_w"] + p["fc2_b"])


def stack_v0(x, params):
    for p in params:
        x = block_v0(x, p)
    return x


# --------------------------------------------------------------- V1 folded
def _block_diag(w, j=J):
    """(K, O) shared weight -> (j*K, j*O) block-diagonal, built in-graph."""
    K, O = w.shape
    eye = jnp.eye(j, dtype=w.dtype)
    # (j, K, j, O): block [a, :, b, :] = w * (a == b)
    return (eye[:, None, :, None] * w[None, :, None, :]).reshape(j * K, j * O)


def block_v1(xf, p):
    """xf: (N, J*EMB) folded frame vectors."""
    y = ln(xf.reshape(N, J, EMB), p["ln1_s"], p["ln1_b"]).reshape(N, J * EMB)
    qkv = y @ _block_diag(p["qkv_w"]) + jnp.tile(p["qkv_b"], J)
    qkv = qkv.reshape(N, J, 3, H, HD).transpose(2, 0, 3, 1, 4)
    q, k, v = qkv[0], qkv[1], qkv[2]
    attn = jax.nn.softmax(
        jnp.einsum("bhqd,bhkd->bhqk", q * (HD ** -0.5), k), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
    o = o.transpose(0, 2, 1, 3).reshape(N, J * EMB)
    xf = xf + (o @ _block_diag(p["proj_w"]) + jnp.tile(p["proj_b"], J))
    y = ln(xf.reshape(N, J, EMB), p["ln2_s"], p["ln2_b"]).reshape(N, J * EMB)
    y = jax.nn.gelu(y @ _block_diag(p["fc1_w"]) + jnp.tile(p["fc1_b"], J),
                    approximate=False)
    return xf + (y @ _block_diag(p["fc2_w"]) + jnp.tile(p["fc2_b"], J))


def stack_v1(x, params):
    xf = x.reshape(N, J * EMB)
    for p in params:
        xf = block_v1(xf, p)
    return xf.reshape(N, J, EMB)


# ----------------------------------------------------------- V2 batch-minor
def block_v2(x, p):
    """x: (J, EMB, N) — batch minor-most, lanes always full."""
    y = ln(x, p["ln1_s"], p["ln1_b"], axis=1)
    qkv = jnp.einsum("ko,jkb->job", p["qkv_w"], y) \
        + p["qkv_b"][None, :, None]
    qkv = qkv.reshape(J, 3, H, HD, N)
    q, k, v = qkv[:, 0], qkv[:, 1], qkv[:, 2]        # (J, H, HD, N)
    attn = jax.nn.softmax(
        jnp.einsum("qhdb,khdb->hqkb", q * (HD ** -0.5), k), axis=2)
    o = jnp.einsum("hqkb,khdb->qhdb", attn, v).reshape(J, EMB, N)
    x = x + jnp.einsum("ko,jkb->job", p["proj_w"], o) \
        + p["proj_b"][None, :, None]
    y = ln(x, p["ln2_s"], p["ln2_b"], axis=1)
    y = jax.nn.gelu(jnp.einsum("ko,jkb->job", p["fc1_w"], y)
                    + p["fc1_b"][None, :, None], approximate=False)
    return x + jnp.einsum("ko,jkb->job", p["fc2_w"], y) \
        + p["fc2_b"][None, :, None]


def stack_v2(x, params):
    xt = x.transpose(1, 2, 0)      # (N, J, EMB) -> (J, EMB, N)
    for p in params:
        xt = block_v2(xt, p)
    return xt.transpose(2, 0, 1)


STACKS = {"v0_baseline": stack_v0, "v1_folded": stack_v1,
          "v2_batch_minor": stack_v2}


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (N, J, EMB), DTYPE)

    ref = None
    results = {}
    for name, stack in STACKS.items():
        fwd = jax.jit(lambda pr, xx, stack=stack: stack(xx, pr))
        out = np.asarray(fwd(params, x), np.float32)
        if ref is None:
            ref = out
        else:
            err = float(np.max(np.abs(out - ref))
                        / (np.max(np.abs(ref)) + 1e-9))
            results[f"{name}_max_rel_err_vs_v0"] = round(err, 6)
        results[f"{name}_fwd_ms"] = round(timed(fwd, params, x), 3)

        def loss(pr, xx, stack=stack):
            return jnp.sum(stack(xx, pr).astype(jnp.float32) ** 2)

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        results[f"{name}_fwdbwd_ms"] = round(timed(bwd, params, x), 3)
        print(json.dumps({k: v for k, v in results.items()
                          if k.startswith(name)}), file=sys.stderr)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
