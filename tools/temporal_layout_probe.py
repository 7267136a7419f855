#!/usr/bin/env python
"""A/B the temporal-kernel slab layouts on the real chip (r5, VERDICT r4 #2).

legacy: (D, T, Np) slabs — the T=9 window tokens sit in the SUBLANE dim and
pad to the 16-sublane bf16 quantum (1.78x bytes on every slab operand in
HBM and VMEM), and kernels reshape to flat (D, T*BB) on entry.
tl: token-leading (T, D, Np) slabs — zero padding, free per-token (D, BB)
planes, attention-half backward at the forward's 256-lane width.

Times fused_temporal_stack (depth=4, PoseFormer B1024 bf16 shapes:
N=8192 windows, T=9, D=832, MLP=1664) fwd-only and fwd+bwd with the
bench's median-of-slope methodology.

PYTHONPATH=/root/repo:/root/.axon_site python tools/temporal_layout_probe.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pedestrians_video_2_carla_tpu.utils.compile_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp

from bench import _timed_loop
from pedestrians_video_2_carla_tpu.ops.pallas import \
    fused_temporal_transformer as ftt

N, T, D, HEADS, DEPTH = 8192, 9, 832, 8, 4
MLP = 2 * D
DTYPE = (jnp.float32 if os.environ.get("PVC_PROBE_DTYPE") == "fp32"
         else jnp.bfloat16)


def make_weights(key):
    ks = jax.random.split(key, DEPTH * 4)
    out = []
    for i in range(DEPTH):
        k = ks[i * 4:(i + 1) * 4]
        out.append((
            jnp.ones((D,), DTYPE), jnp.zeros((D,), DTYPE),
            jax.random.normal(k[0], (D, 3 * D), DTYPE) * 0.02,
            jnp.zeros((3 * D,), DTYPE),
            jax.random.normal(k[1], (D, D), DTYPE) * 0.02,
            jnp.zeros((D,), DTYPE),
            jnp.ones((D,), DTYPE), jnp.zeros((D,), DTYPE),
            jax.random.normal(k[2], (D, MLP), DTYPE) * 0.02,
            jnp.zeros((MLP,), DTYPE),
            jax.random.normal(k[3], (MLP, D), DTYPE) * 0.02,
            jnp.zeros((D,), DTYPE),
        ))
    return out


def main():
    layouts = sys.argv[1:] or ["legacy", "tl"]
    x = jax.random.normal(jax.random.PRNGKey(0), (N, T, D), DTYPE)
    wl = make_weights(jax.random.PRNGKey(1))
    for layout in layouts:
        ftt.LAYOUT = layout

        fwd = jax.jit(lambda x, wl: ftt.fused_temporal_stack(x, wl, HEADS))
        y = fwd(x, wl)
        float(jnp.sum(y.astype(jnp.float32)))

        def loss(x, wl):
            return jnp.sum(
                ftt.fused_temporal_stack(x, wl, HEADS).astype(jnp.float32)
                ** 2)

        grad = jax.jit(jax.grad(loss, argnums=(0, 1)))
        g = grad(x, wl)
        float(jnp.sum(g[0].astype(jnp.float32)))

        for label, fn in (("fwd ", lambda: fwd(x, wl)),
                          ("f+b ", lambda: grad(x, wl))):
            spread = []
            dt = _timed_loop(fn, 10, warmup=3, estimates=3,
                             spread_out=spread)
            per = dt / 10 * 1e3
            print(f"{layout:7s} {label}: {per:7.2f} ms/stack "
                  f"({per / DEPTH:6.2f} ms/block)  "
                  f"spread={[round(s * 1e3, 2) for s in spread]}",
                  flush=True)


if __name__ == "__main__":
    main()
