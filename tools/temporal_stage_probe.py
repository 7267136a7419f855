"""Probe: what does PoseFormer's *temporal* stage pay for its 9-token
sequences, and can XLA-level reformulation recover it?

After the fused spatial kernel, the temporal stack dominates the B1024 bf16
step (slope-timed 49 ms fwd / 123 ms fwd+bwd at (8192, 9, 832) of a ~184 ms
step). Its matmuls are healthy MXU shapes (K=832, rows 73728), so unlike the
spatial stage there is no lane catastrophe — but every rank-3 intermediate
(B*W, 9, 832) pads the 9-token sublane axis 9->16 (1.78x bytes) and the
(B*W, 9, 832) <-> (B*W*9, 832) reshapes around each dense relayout it.

Variants (identical math unless noted):
  v0 baseline   — the shipped _Block stack.
  v1 padded16   — tokens zero-padded 9 -> 16 with masked softmax: MORE flops,
                  but rank-3 shapes are tile-aligned (is padding the tax?).
  v2 flat       — activations kept (B*W*9, 832) 2-D between ops; rank-3 only
                  inside attention.

PYTHONPATH=/root/repo:/root/.axon_site python tools/temporal_stage_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timed_loop

N, RF, D, HEADS, DEPTH = 8192, 9, 832, 8, 4
HD = D // HEADS
MLP = 2 * D
DTYPE = jnp.bfloat16
LN_EPS = 1e-5


def make_params(key):
    ks = jax.random.split(key, DEPTH * 4)
    p = []
    for i in range(DEPTH):
        k = ks[i * 4:(i + 1) * 4]
        p.append(dict(
            ln1_s=jnp.ones((D,), DTYPE), ln1_b=jnp.zeros((D,), DTYPE),
            qkv_w=jax.random.normal(k[0], (D, 3 * D), DTYPE) * 0.02,
            qkv_b=jnp.zeros((3 * D,), DTYPE),
            proj_w=jax.random.normal(k[1], (D, D), DTYPE) * 0.02,
            proj_b=jnp.zeros((D,), DTYPE),
            ln2_s=jnp.ones((D,), DTYPE), ln2_b=jnp.zeros((D,), DTYPE),
            fc1_w=jax.random.normal(k[2], (D, MLP), DTYPE) * 0.02,
            fc1_b=jnp.zeros((MLP,), DTYPE),
            fc2_w=jax.random.normal(k[3], (MLP, D), DTYPE) * 0.02,
            fc2_b=jnp.zeros((D,), DTYPE),
        ))
    return p


def ln(x, s, b):
    x32 = x.astype(jnp.float32)
    m = jnp.mean(x32, axis=-1, keepdims=True)
    v = jnp.maximum(jnp.mean(jnp.square(x32 - m), axis=-1, keepdims=True), 0)
    return ((x32 - m) * jax.lax.rsqrt(v + LN_EPS)).astype(x.dtype) * s + b


def attn(q, k, v, mask=None):
    """(N, H, T, hd) in, (N, T, H*hd) out; fp32 softmax."""
    s = jnp.einsum("bhqd,bhkd->bhqk", q * (HD ** -0.5), k,
                   preferred_element_type=jnp.float32)
    if mask is not None:
        s = jnp.where(mask, s, -1e9)
    p = jax.nn.softmax(s, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, v)
    T = o.shape[2]
    return o.transpose(0, 2, 1, 3).reshape(-1, T, D)


def block_v0(x, p, mask=None):
    n, T, _ = x.shape
    y = ln(x, p["ln1_s"], p["ln1_b"])
    qkv = (y @ p["qkv_w"] + p["qkv_b"]).reshape(n, T, 3, HEADS, HD)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    o = attn(qkv[0], qkv[1], qkv[2], mask)
    x = x + (o @ p["proj_w"] + p["proj_b"])
    y = ln(x, p["ln2_s"], p["ln2_b"])
    y = jax.nn.gelu(y @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return x + (y @ p["fc2_w"] + p["fc2_b"])


def stack_v0(x, params):
    for p in params:
        x = block_v0(x, p)
    return x


def stack_v1(x, params):
    xp = jnp.concatenate(
        [x, jnp.zeros((N, 16 - RF, D), x.dtype)], axis=1)
    mask = (jnp.arange(16) < RF)[None, None, None, :]
    for p in params:
        xp = block_v1(xp, p, mask)
    return xp[:, :RF]


def block_v1(x, p, mask):
    return block_v0(x, p, mask)


def block_v2(xf, p):
    """xf: (N*RF, D) flat; rank-3 only inside attention."""
    y = ln(xf, p["ln1_s"], p["ln1_b"])
    qkv = (y @ p["qkv_w"] + p["qkv_b"]).reshape(N, RF, 3, HEADS, HD)
    qkv = qkv.transpose(2, 0, 3, 1, 4)
    o = attn(qkv[0], qkv[1], qkv[2]).reshape(N * RF, D)
    xf = xf + (o @ p["proj_w"] + p["proj_b"])
    y = ln(xf, p["ln2_s"], p["ln2_b"])
    y = jax.nn.gelu(y @ p["fc1_w"] + p["fc1_b"], approximate=False)
    return xf + (y @ p["fc2_w"] + p["fc2_b"])


def stack_v2(x, params):
    xf = x.reshape(N * RF, D)
    for p in params:
        xf = block_v2(xf, p)
    return xf.reshape(N, RF, D)


STACKS = {"v0_baseline": stack_v0, "v1_padded16": stack_v1,
          "v2_flat": stack_v2}


def main():
    params = make_params(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (N, RF, D), DTYPE)

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
        results[f"{name}_fwd_ms"] = round(
            _timed_loop(lambda: fwd(params, x), 8, warmup=2) / 8 * 1e3, 2)

        def loss(pr, xx, stack=stack):
            return jnp.sum(stack(xx, pr).astype(jnp.float32) ** 2)

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1)))
        results[f"{name}_fwdbwd_ms"] = round(
            _timed_loop(lambda: bwd(params, x), 8, warmup=2) / 8 * 1e3, 2)
        print(json.dumps({k: v for k, v in results.items()
                          if k.startswith(name)}), file=sys.stderr)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
