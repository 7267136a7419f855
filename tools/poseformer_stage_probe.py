"""Probe 2: stage-level timing of the PoseFormer B1024 bf16 train step.

The attention probe (tools/poseformer_probe.py) showed isolated attention is
0.02-0.07 ms — irrelevant to the ~269 ms step. This times the real stages:
full train step, model fwd, model fwd+bwd (MSE head, no FK), spatial stage
alone, temporal stage alone — to locate the other ~200 ms.

PYTHONPATH=/root/repo:/root/.axon_site python tools/poseformer_stage_probe.py
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp

B, L, J, RF = 1024, 16, 26, 9
W = L - RF + 1
EMB, DEPTH, HEADS = 32, 4, 8
FRAME_DIM = J * EMB


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


def main():
    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import \
        MOVEMENTS_MODELS
    from pedestrians_video_2_carla_tpu.models.movements.pose_former import \
        _Block
    from pedestrians_video_2_carla_tpu.utils.rng import training_rng

    results = {}
    cfg = Carla2D3DConfig(batch_size=B, clip_length=L)
    batch = generate_batch(jax.random.PRNGKey(0), cfg)
    batch = jax.tree_util.tree_map(lambda x: x.block_until_ready(), batch)

    # 1) the full flow train step (what bench.py times)
    flow = PoseLiftingFlow(
        movements_model=MOVEMENTS_MODELS["PoseFormer"](clip_length=L),
        loss_modes=[LossModes.loc_2d_3d],
        movements_optimizer=OptimizerSettings(lr=1e-3),
        precision="bf16")
    state = flow.init_state(jax.random.PRNGKey(1), batch)
    rng = training_rng(2)
    step = jax.jit(flow.training_step, donate_argnums=(0,)) \
        .lower(state, batch, rng).compile()
    box = [state]

    def full_step():
        box[0], logs = step(box[0], batch, rng)
        return logs

    results["full_train_step_ms"] = round(timed(full_step), 2)

    # 2) model forward alone (bf16 params+inputs, like the AMP path)
    model = MOVEMENTS_MODELS["PoseFormer"](clip_length=L)
    inputs = batch[0]
    params = model.init(jax.random.PRNGKey(0), inputs, training=False)
    params_bf16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    x_bf16 = inputs.astype(jnp.bfloat16)
    fwd = jax.jit(lambda p, x: model.apply(p, x, training=False))
    results["model_fwd_ms"] = round(timed(fwd, params_bf16, x_bf16), 2)

    # 3) model fwd+bwd with a plain MSE head (no FK/projection/optimizer)
    def mse(p, x):
        out = model.apply(p, x, training=False)
        return jnp.mean(jnp.square(out.astype(jnp.float32)))

    bwd = jax.jit(jax.grad(mse))
    results["model_fwdbwd_ms"] = round(timed(bwd, params_bf16, x_bf16), 2)

    # 4) spatial stage alone: DEPTH blocks on (B*L, J, EMB)
    class Spatial(nn.Module):
        @nn.compact
        def __call__(self, s):
            for i in range(DEPTH):
                s = _Block(EMB, HEADS, 2.0, 0.0, 0.0,
                           name=f"b{i}")(s, False)
            return s

    s_in = jax.random.normal(jax.random.PRNGKey(2), (B * L, J, EMB),
                             jnp.bfloat16)
    sp = Spatial()
    sp_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), sp.init(jax.random.PRNGKey(3), s_in))
    sp_fwd = jax.jit(lambda p, x: sp.apply(p, x))
    results["spatial_stack_fwd_ms"] = round(timed(sp_fwd, sp_params, s_in), 2)
    sp_bwd = jax.jit(jax.grad(
        lambda p, x: jnp.mean(jnp.square(sp.apply(p, x).astype(jnp.float32)))))
    results["spatial_stack_fwdbwd_ms"] = round(
        timed(sp_bwd, sp_params, s_in), 2)

    # 5) temporal stage alone: DEPTH blocks on (B*W, RF, FRAME_DIM)
    class Temporal(nn.Module):
        @nn.compact
        def __call__(self, t):
            for i in range(DEPTH):
                t = _Block(FRAME_DIM, HEADS, 2.0, 0.0, 0.0,
                           name=f"b{i}")(t, False)
            return t

    t_in = jax.random.normal(jax.random.PRNGKey(4), (B * W, RF, FRAME_DIM),
                             jnp.bfloat16)
    tp = Temporal()
    tp_params = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16), tp.init(jax.random.PRNGKey(5), t_in))
    tp_fwd = jax.jit(lambda p, x: tp.apply(p, x))
    results["temporal_stack_fwd_ms"] = round(timed(tp_fwd, tp_params, t_in), 2)
    tp_bwd = jax.jit(jax.grad(
        lambda p, x: jnp.mean(jnp.square(tp.apply(p, x).astype(jnp.float32)))))
    results["temporal_stack_fwdbwd_ms"] = round(
        timed(tp_bwd, tp_params, t_in), 2)

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
