"""r3 probe: slope-timed decomposition of the CURRENT PoseFormer B1024 bf16
train step (fused spatial+temporal kernels active) to locate the next
optimization target (VERDICT r2 #7: beat 8.1k clips/s).

Components timed (all slope method — see docs/PERFORMANCE.md "Timing
methodology"):
  full_step          the bench's train step (loc_2d_3d)
  step_no_fk         train step with cum_pose_changes (no FK/projection)
  model_fwdbwd       PoseFormer fwd+bwd under a plain MSE head
  model_fwd          PoseFormer fwd
  temporal_fused_*   the 4-block fused temporal stack alone (fwd / fwd+bwd)
  spatial_fused_*    the 4-block fused spatial stack alone
  slab_transposes    the per-block (N,T,D)<->(D,T,Np) layout round-trips

PYTHONPATH=/root/repo:/root/.axon_site python tools/poseformer_r3_probe.py
"""
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B, L, J, RF = 1024, 16, 26, 9
W = L - RF + 1
EMB, DEPTH, HEADS = 32, 4, 8
D = J * EMB


def slope(fn, *args, steps=24, bursts=3, grow=2):
    out = None
    for _ in range(3):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))

    def run(n):
        t0 = time.perf_counter()
        o = None
        for _ in range(n):
            o = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(o)[0]))
        return time.perf_counter() - t0

    n1, n2 = max(1, steps // 8), steps
    for _ in range(grow + 1):
        T1 = min(run(n1) for _ in range(bursts))
        T2 = min(run(n2) for _ in range(bursts))
        if T2 - T1 > 0.05:
            break
        n1, n2 = n2, n2 * 4
    return max((T2 - T1) / (n2 - n1), 0.0) * 1e3


def main():
    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import \
        MOVEMENTS_MODELS
    from pedestrians_video_2_carla_tpu.ops.pallas.fused_temporal_transformer \
        import fused_temporal_block
    from pedestrians_video_2_carla_tpu.utils.rng import training_rng

    results = {}

    def emit(key, value):
        results[key] = round(value, 2)
        print(f"{key}: {results[key]}", flush=True)

    cfg = Carla2D3DConfig(batch_size=B, clip_length=L)
    batch = generate_batch(jax.random.PRNGKey(0), cfg)
    batch = jax.tree_util.tree_map(lambda x: x.block_until_ready(), batch)

    def step_ms(loss_mode, model_name="PoseFormer"):
        flow = PoseLiftingFlow(
            movements_model=MOVEMENTS_MODELS[model_name](clip_length=L),
            loss_modes=[loss_mode],
            movements_optimizer=OptimizerSettings(lr=1e-3),
            precision="bf16")
        state = flow.init_state(jax.random.PRNGKey(1), batch)
        rng = training_rng(2)
        step = jax.jit(flow.training_step, donate_argnums=(0,)) \
            .lower(state, batch, rng).compile()
        box = [state]

        def f():
            box[0], logs = step(box[0], batch, rng)
            return logs
        return slope(f)

    emit("full_step_ms", step_ms(LossModes.loc_2d_3d))
    # no-FK step: the Rot variant outputs rotation matrices, so
    # cum_pose_changes is available and the FK+projection+camera stack DCEs
    emit("step_no_fk_ms", step_ms(LossModes.cum_pose_changes,
                                  "PoseFormerRot"))

    # model alone (bf16 params/inputs — the AMP compute path)
    model = MOVEMENTS_MODELS["PoseFormer"](clip_length=L)
    inputs = batch[0]
    params = model.init(jax.random.PRNGKey(0), inputs, training=False)
    pb = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if jnp.issubdtype(x.dtype, jnp.floating) else x, params)
    xb = inputs.astype(jnp.bfloat16)
    fwd = jax.jit(lambda p, x: model.apply(p, x, training=False))
    emit("model_fwd_ms", slope(fwd, pb, xb))
    bwd = jax.jit(jax.grad(lambda p, x: jnp.mean(jnp.square(
        model.apply(p, x, training=False).astype(jnp.float32)))))
    emit("model_fwdbwd_ms", slope(bwd, pb, xb))

    # fused temporal stack alone on (B*W, RF, D) bf16
    key = jax.random.PRNGKey(7)
    t_in = jax.random.normal(key, (B * W, RF, D), jnp.bfloat16)
    wp = []
    for i in range(DEPTH):
        k = jax.random.fold_in(key, i)
        mk = functools.partial(jax.random.normal, dtype=jnp.bfloat16)
        wp.append((
            jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16),
            mk(jax.random.fold_in(k, 0), (D, 3 * D)) * 0.02,
            jnp.zeros((3 * D,), jnp.bfloat16),
            mk(jax.random.fold_in(k, 1), (D, D)) * 0.02,
            jnp.zeros((D,), jnp.bfloat16),
            jnp.ones((D,), jnp.bfloat16), jnp.zeros((D,), jnp.bfloat16),
            mk(jax.random.fold_in(k, 2), (D, 2 * D)) * 0.02,
            jnp.zeros((2 * D,), jnp.bfloat16),
            mk(jax.random.fold_in(k, 3), (2 * D, D)) * 0.02,
            jnp.zeros((D,), jnp.bfloat16)))
    wp = tuple(wp)

    def t_stack(x, wp):
        for i in range(DEPTH):
            x = fused_temporal_block(x, wp[i], HEADS)
        return x

    tf = jax.jit(t_stack)
    emit("temporal_fused_fwd_ms", slope(tf, t_in, wp))
    tg = jax.jit(jax.grad(lambda x, wp: jnp.sum(
        t_stack(x, wp).astype(jnp.float32) ** 2), argnums=(0, 1)))
    emit("temporal_fused_fwdbwd_ms", slope(tg, t_in, wp))

    # pure slab-layout transposes the per-block wrappers pay (fwd only):
    # (N,T,D)->(D,T,N) in + (D,T,N)->(N,T,D) out, per block
    def transposes(x):
        for _ in range(DEPTH):
            xt = jnp.transpose(x, (2, 1, 0))
            x = jnp.transpose(xt, (2, 1, 0))
        return x
    tr = jax.jit(transposes)
    emit("slab_transposes_fwd_ms", slope(tr, t_in))

    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
