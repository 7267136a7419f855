"""A/B: fused graph-GRU Pallas kernel vs the fully-unrolled XLA scan on the
real GConvGRU classification train step (BASELINE config 3 shapes,
B256/L16/H128, fp32 and bf16), slope-timed on the live chip.

PYTHONPATH=/root/repo:/root/.axon_site python tools/graph_gru_kernel_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from bench import _timed_loop

B, L = 256, 16


def main():
    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.classification import \
        ClassificationFlow
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.classification import \
        CLASSIFICATION_MODELS

    cfg = Carla2D3DConfig(batch_size=B, clip_length=L)
    inputs, targets, meta = generate_batch(jax.random.PRNGKey(0), cfg)
    labels = jnp.asarray(
        np.random.default_rng(7).integers(0, 2, (B,)), jnp.int32)
    batch = (inputs, {**targets, "crossing": labels}, meta)
    rng = jax.random.PRNGKey(3)

    results = {}
    for kernel in ("xla", "pallas"):
        for dtype in ("fp32", "bf16"):
            flow = ClassificationFlow(
                classification_model=CLASSIFICATION_MODELS["GConvGRU"](
                    graph_kernel=kernel),
                classification_optimizer=OptimizerSettings(lr=1e-3),
                precision="bf16" if dtype == "bf16" else "32",
            )
            state = flow.init_state(jax.random.PRNGKey(1), batch)
            step = jax.jit(flow.training_step)
            _, logs = step(state, batch, rng)
            results[f"{kernel}_{dtype}_loss"] = float(
                jax.device_get(logs["train_loss/primary"]))

            # step into itself so the timed loop chains real dependencies
            def chained(s=[state]):
                s[0], lg = step(s[0], batch, rng)
                return lg["train_loss/primary"]

            ms = _timed_loop(chained, 16, warmup=4) / 16 * 1e3
            results[f"{kernel}_{dtype}_step_ms"] = round(ms, 3)
            results[f"{kernel}_{dtype}_clips_s"] = round(B / ms * 1e3)
            print(json.dumps({k: v for k, v in results.items()
                              if k.startswith(f"{kernel}_{dtype}")}),
                  file=sys.stderr)

    results["pallas_speedup_fp32"] = round(
        results["xla_fp32_step_ms"] / results["pallas_fp32_step_ms"], 3)
    results["pallas_speedup_bf16"] = round(
        results["xla_bf16_step_ms"] / results["pallas_bf16_step_ms"], 3)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
