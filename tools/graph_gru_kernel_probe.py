"""A/B: fused graph-GRU/LSTM Pallas kernels vs the XLA scan on the real
GConvGRU / GConvLSTM classification train steps (BASELINE config 3 shapes,
B256/L16/H128, fp32 and bf16), slope-timed on the live chip.

PYTHONPATH=/root/repo:/root/.axon_site python tools/graph_gru_kernel_probe.py [model...]
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from bench import _timed_loop

B, L = 256, 16


def main(models):
    import jax.numpy as jnp

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
    for model in models:
        for kernel in ("xla", "pallas"):
            for dtype in ("fp32", "bf16"):
                tag = f"{model}_{kernel}_{dtype}"
                cls = CLASSIFICATION_MODELS[model]
                arg = ("graph_kernel" if any(
                    f.name == "graph_kernel" for f in
                    __import__("dataclasses").fields(cls)) else "rnn_kernel")
                flow = ClassificationFlow(
                    classification_model=cls(**{arg: kernel}),
                    classification_optimizer=OptimizerSettings(lr=1e-3),
                    precision="bf16" if dtype == "bf16" else "32",
                )
                state = flow.init_state(jax.random.PRNGKey(1), batch)
                step = jax.jit(flow.training_step)
                _, logs = step(state, batch, rng)
                results[f"{tag}_loss"] = float(
                    jax.device_get(logs["train_loss/primary"]))

                # step into itself so the timed loop chains real dependencies
                def chained(s=[state]):
                    s[0], lg = step(s[0], batch, rng)
                    return lg["train_loss/primary"]

                ms = _timed_loop(chained, 16, warmup=4) / 16 * 1e3
                results[f"{tag}_step_ms"] = round(ms, 3)
                results[f"{tag}_clips_s"] = round(B / ms * 1e3)
                print(json.dumps({k: v for k, v in results.items()
                                  if k.startswith(tag)}), file=sys.stderr)

        for dtype in ("fp32", "bf16"):
            results[f"{model}_pallas_speedup_{dtype}"] = round(
                results[f"{model}_xla_{dtype}_step_ms"]
                / results[f"{model}_pallas_{dtype}_step_ms"], 3)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(sys.argv[1:] or ["GConvGRU", "GConvLSTM"])
