"""Probe: where do PoseFormer's temporal-stage bytes/cycles go, and do
alternative attention formulations beat the current one on TPU?

Context (docs/PERFORMANCE.md "MFU"): PoseFormer B1024 bf16 runs at ~19% MFU /
~74% of the (pre-fusion-estimate) HBM roofline. The temporal stage works on
(B*W=8192, T=9, D=832) sequences; the attention scores tensor is
(8192, H=8, 9, 9), whose trailing (9, 9) dims tile-pad to (16, 128) on TPU —
~16x padding on every HBM touch of the scores — and every q@k^T dot is a
(9, 104, 9) sliver of a 128x128x128 MXU tile. This script times isolated
attention variants and the full train step so the fix (if any) is measured,
not guessed.

Run on the real chip:  PYTHONPATH=/root/repo:/root/.axon_site python
tools/poseformer_probe.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N, T, D, H = 8192, 9, 832, 8  # B*W windows, tokens, dim, heads
HD = D // H
DTYPE = jnp.bfloat16


def timed(fn, *args, steps=20, bursts=3, warmup=5):
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
    return dt / steps * 1e3  # ms per call


# ---------------------------------------------------------------- variants
def attn_baseline(q, k, v):
    """Current models/movements/pose_former.py::_Attention core."""
    attn = jnp.einsum("bhqd,bhkd->bhqk", q * (HD ** -0.5), k)
    attn = jax.nn.softmax(attn, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


def attn_qk_major(q, k, v):
    """Scores laid out (T, T, N, H): the tiny (9, 9) dims become major axes,
    the minor dims are (N, H) = (8192, 8) -> perfectly tiled lanes."""
    attn = jnp.einsum("bhqd,bhkd->qkbh", q * (HD ** -0.5), k)
    attn = jax.nn.softmax(attn, axis=1)
    return jnp.einsum("qkbh,bhkd->bhqd", attn, v)


def attn_tokens_folded(q, k, v):
    """Fold heads into the batch dim explicitly ((N*H, T, hd)) so the batched
    dots present one big leading dim to XLA."""
    qf = (q * (HD ** -0.5)).reshape(N * H, T, HD)
    kf = k.reshape(N * H, T, HD)
    vf = v.reshape(N * H, T, HD)
    attn = jax.nn.softmax(qf @ kf.transpose(0, 2, 1), axis=-1)
    return (attn @ vf).reshape(N, H, T, HD)


def attn_sdpa(q, k, v):
    """XLA's native scaled-dot-product attention entry point (picks its own
    layouts/fusions; on TPU can lower to a fused kernel)."""
    # jax.nn.dot_product_attention wants (B, T, H, hd)
    out = jax.nn.dot_product_attention(
        q.transpose(0, 2, 1, 3), k.transpose(0, 2, 1, 3),
        v.transpose(0, 2, 1, 3))
    return out.transpose(0, 2, 1, 3)


def attn_dense_unrolled(q, k, v):
    """T=9 is tiny: compute scores as one (N, H, T*T) tensor via a single
    batched dot with the key dim flattened — scores' minor dim becomes
    T*T=81 -> pads to 128 once instead of (16,128) twice."""
    qs = q * (HD ** -0.5)
    attn = jnp.einsum("bhqd,bhkd->bhqk", qs, k).reshape(N, H, T * T)
    attn = jax.nn.softmax(attn.reshape(N, H, T, T), axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", attn, v)


VARIANTS = {
    "baseline": attn_baseline,
    "qk_major": attn_qk_major,
    "tokens_folded": attn_tokens_folded,
    "sdpa": attn_sdpa,
}


def main():
    print("devices:", jax.devices(), file=sys.stderr)
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    q = jax.random.normal(kq, (N, H, T, HD), DTYPE)
    k = jax.random.normal(kk, (N, H, T, HD), DTYPE)
    v = jax.random.normal(kv, (N, H, T, HD), DTYPE)

    results = {}
    for name, fn in VARIANTS.items():
        fwd = jax.jit(fn)
        try:
            ms = timed(fwd, q, k, v)
            results[f"{name}_fwd_ms"] = round(ms, 3)
        except Exception as e:
            results[f"{name}_fwd_error"] = repr(e)[:100]
            continue

        def loss(q, k, v, fn=fn):
            return jnp.sum(fn(q, k, v).astype(jnp.float32) ** 2)

        bwd = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))
        try:
            ms = timed(bwd, q, k, v)
            results[f"{name}_fwdbwd_ms"] = round(ms, 3)
        except Exception as e:
            results[f"{name}_fwdbwd_error"] = repr(e)[:100]
        print(json.dumps({name: {k2: v2 for k2, v2 in results.items()
                                 if k2.startswith(name)}}), file=sys.stderr)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
