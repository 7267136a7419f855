"""Probe: where do the GConvGRU classification step's ~16.8 ms go?

BASELINE config 3's GConvGRU (dense-adjacency Chebyshev GRU over 26-node
skeleton graphs, ``models/classification/gnn.py``) slope-times at ~16.8 ms
per B256/L16 train step — ~1 ms/frame for two small matmuls, which smells
like per-iteration relayouts rather than matmul time (the same pathology the
fused spatial-transformer kernel fixed for PoseFormer: the ``(B, 26, H)``
carry's 26-sublane joint axis forces a transpose for every ``op @ h``
Chebyshev contraction inside the scan).

Variants (identical math, same weights):
  V0 shipped     — carry (B, J, H); cheb = einsum "ij,bjc->bic".
  V1 joint-major — carry (J, B, H); cheb = one (J, J) x (J, B*H) dot with no
                   transpose; gate matmuls contract the last dim as before.
  V2 fused-frame — V1 + the whole 16-frame recurrence unrolled (no lax.scan,
                   exposes whether scan overhead itself matters).

Also times the real ClassificationFlow GConvGRU train step for context.

PYTHONPATH=/root/repo:/root/.axon_site python tools/gnn_scan_probe.py
"""
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timed_loop

B, L, J, H, K = 256, 16, 26, 128, 2
GATES = ("z", "r", "h")


def make_params(key, in_features):
    """Two GRU layers of explicit gate weights (mirrors _gate_params)."""
    layers = []
    for li, C in enumerate((in_features, H)):
        k = jax.random.split(jax.random.fold_in(key, li), 12)
        p = {}
        for gi, g in enumerate(GATES):
            p[g] = dict(
                wx=jnp.concatenate([
                    jax.random.normal(k[gi * 4 + i], (C, H)) * 0.05
                    for i in range(K)], axis=0),          # (K*C, H)
                bx=jnp.zeros((H,)),
                wh=jnp.concatenate([
                    jax.random.normal(k[gi * 4 + 2 + i], (H, H)) * 0.05
                    for i in range(K)], axis=0),          # (K*H, H)
                bh=jnp.zeros((H,)),
            )
        layers.append(p)
    return layers


def cheb_b(op, x):
    """[T0 x, T1 x] on (..., J, C), joints on axis -2 (shipped layout)."""
    return jnp.concatenate([x, jnp.einsum("ij,...jc->...ic", op, x)], axis=-1)


def cheb_j(op, x):
    """Same on (J, ..., C) with joints leading: a single clean dot."""
    t1 = jnp.tensordot(op, x, axes=((1,), (0,)))
    return jnp.concatenate([x, t1], axis=-1)


def gru_layer_v0(p, op, x):
    """Shipped formulation: carry (B, J, H), input hoist + fused z/r."""
    wzr_x = jnp.concatenate([p["z"]["wx"], p["r"]["wx"]], axis=1)
    bzr_x = jnp.concatenate([p["z"]["bx"], p["r"]["bx"]])
    wzr_h = jnp.concatenate([p["z"]["wh"], p["r"]["wh"]], axis=1)
    bzr_h = jnp.concatenate([p["z"]["bh"], p["r"]["bh"]])
    xc = cheb_b(op, x)                                   # (B, L, J, K*C)
    x_zr = xc @ wzr_x + bzr_x                            # (B, L, J, 2H)
    x_h = xc @ p["h"]["wx"] + p["h"]["bx"]               # (B, L, J, H)
    xs = jnp.moveaxis(jnp.concatenate([x_zr, x_h], -1), 1, 0)  # (L, B, J, 3H)

    def step(h, xt):
        zr = cheb_b(op, h) @ wzr_h + bzr_h
        z = jax.nn.sigmoid(xt[..., :H] + zr[..., :H])
        r = jax.nn.sigmoid(xt[..., H:2 * H] + zr[..., H:])
        h_t = jnp.tanh(xt[..., 2 * H:]
                       + cheb_b(op, r * h) @ p["h"]["wh"] + p["h"]["bh"])
        h_new = z * h + (1 - z) * h_t
        return h_new, h_new

    _, ys = jax.lax.scan(step, jnp.zeros((B, J, H), x.dtype), xs)
    return jnp.moveaxis(ys, 0, 1)                        # (B, L, J, H)


def gru_layer_v1(p, op, x, unroll=1):
    """Joint-major carry (J, B, H): the cheb contraction needs no transpose."""
    wzr_x = jnp.concatenate([p["z"]["wx"], p["r"]["wx"]], axis=1)
    bzr_x = jnp.concatenate([p["z"]["bx"], p["r"]["bx"]])
    wzr_h = jnp.concatenate([p["z"]["wh"], p["r"]["wh"]], axis=1)
    bzr_h = jnp.concatenate([p["z"]["bh"], p["r"]["bh"]])
    # inputs once for the clip, then to (L, J, B, 3H)
    xc = cheb_b(op, x)
    x_all = jnp.concatenate([xc @ wzr_x + bzr_x, xc @ p["h"]["wx"]
                             + p["h"]["bx"]], -1)        # (B, L, J, 3H)
    xs = jnp.transpose(x_all, (1, 2, 0, 3))              # (L, J, B, 3H)

    def step(h, xt):                                     # h: (J, B, H)
        zr = cheb_j(op, h) @ wzr_h + bzr_h
        z = jax.nn.sigmoid(xt[..., :H] + zr[..., :H])
        r = jax.nn.sigmoid(xt[..., H:2 * H] + zr[..., H:])
        h_t = jnp.tanh(xt[..., 2 * H:]
                       + cheb_j(op, r * h) @ p["h"]["wh"] + p["h"]["bh"])
        h_new = z * h + (1 - z) * h_t
        return h_new, h_new

    _, ys = jax.lax.scan(step, jnp.zeros((J, B, H), x.dtype), xs,
                         unroll=unroll)
    return jnp.transpose(ys, (2, 0, 1, 3))               # (B, L, J, H)


def model(layer_fn, params, op, x):
    h = jax.nn.relu(layer_fn(params[0], op, x))
    h = jax.nn.relu(layer_fn(params[1], op, h))
    return jnp.mean(h[:, -1], axis=-2)                   # (B, H)


def main():
    from pedestrians_video_2_carla_tpu.models.classification.gnn import \
        laplacian_op
    from pedestrians_video_2_carla_tpu.skeletons import CARLA_SKELETON

    op = jnp.asarray(laplacian_op(CARLA_SKELETON), jnp.float32)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, J, 2))
    params = make_params(jax.random.PRNGKey(1), 2)

    results = {}
    variants = {
        "v0_shipped": functools.partial(model, gru_layer_v0),
        "v1_joint_major": functools.partial(model, gru_layer_v1),
        "v2_joint_major_unroll": functools.partial(
            model, functools.partial(gru_layer_v1, unroll=L)),
    }
    ref = None
    for name, fn in variants.items():
        fwd = jax.jit(fn)
        out = np.asarray(fwd(params, op, x))
        if ref is None:
            ref = out
        else:
            results[f"{name}_max_abs_err"] = float(np.max(np.abs(out - ref)))
        results[f"{name}_fwd_ms"] = round(
            _timed_loop(lambda: fwd(params, op, x), 16, warmup=2) / 16 * 1e3,
            3)
        bwd = jax.jit(jax.grad(
            lambda p, o_, x_, fn=fn: jnp.sum(jnp.square(fn(p, o_, x_)))))
        results[f"{name}_fwdbwd_ms"] = round(
            _timed_loop(lambda: bwd(params, op, x), 16, warmup=2) / 16 * 1e3,
            3)
        print(json.dumps({k: v for k, v in results.items()
                          if k.startswith(name)}), file=sys.stderr)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
