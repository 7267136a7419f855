#!/usr/bin/env python
"""GConvGRU classification train-step trace (VERDICT r3 weak #4: the
BASELINE config-3 graph family ran at 30k clips/s vs LSTM's 378k with no
published breakdown). Slope-times the B256/L16 step, then captures a
device trace and buckets device time into the fused graph-GRU pallas
calls (fwd / bwd), other XLA compute, and gaps; prints an analytic
roofline for the step.

PYTHONPATH=/root/repo:/root/.axon_site python tools/gconv_gru_trace.py
"""
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, L, J = 256, 16, 26


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


def build_step(graph_kernel=None, hidden_size=128):
    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.classification import \
        ClassificationFlow
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.classification import \
        CLASSIFICATION_MODELS
    from pedestrians_video_2_carla_tpu.utils.rng import training_rng

    cfg = Carla2D3DConfig(batch_size=B, clip_length=L)
    inputs, targets, meta = generate_batch(jax.random.PRNGKey(0), cfg)
    labels = jnp.asarray(np.random.default_rng(0).integers(
        0, 2, B, dtype=np.int32))
    batch = (inputs, {**targets, "crossing": labels}, meta)
    batch = jax.tree_util.tree_map(lambda x: x.block_until_ready(), batch)
    kw = {"hidden_size": hidden_size}
    if graph_kernel:
        kw["graph_kernel"] = graph_kernel
    flow = ClassificationFlow(
        classification_model=CLASSIFICATION_MODELS["GConvGRU"](**kw),
        classification_optimizer=OptimizerSettings(lr=1e-3))
    state = flow.init_state(jax.random.PRNGKey(1), batch)
    rng = training_rng(2)
    step = jax.jit(flow.training_step, donate_argnums=(0,)) \
        .lower(state, batch, rng).compile()
    box = [state]

    def f():
        box[0], logs = step(box[0], batch, rng)
        return logs

    return f


def trace_buckets(f, reps=3, tag="gru"):
    tdir = f"/tmp/gru_trace_{tag}"
    with jax.profiler.trace(tdir):
        out = None
        for _ in range(reps):
            out = f()
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    paths = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    ev = json.load(gzip.open(sorted(paths)[-1]))["traceEvents"]
    pids = {}
    for e in ev:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e["args"].get("name", "")
    device_pids = [p for p, n in pids.items() if "TPU" in n or "Device" in n]
    agg = {}
    total = 0.0
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        name = e["name"]
        if name.startswith("jit_"):  # enclosing module event, not an op
            continue
        dur = e.get("dur", 0) / 1e3
        total += dur
        if "transpose" in name and "jvp" in name:
            key = "pallas_graph_gru_bwd"
        elif "jvp" in name or "pallas" in name:
            key = "pallas_graph_gru_fwd"
        elif any(k in name for k in ("fusion", "convert", "copy",
                                     "reduce", "dot", "scan", "while")):
            key = "xla_" + name.split(".")[0].split("(")[0][:24]
        else:
            key = name.split(".")[0].split("(")[0][:28]
        agg.setdefault(key, [0, 0.0])
        agg[key][0] += 1
        agg[key][1] += dur
    print(f"-- device buckets (avg over {reps} steps; device total "
          f"{total/reps:.2f} ms) --")
    for name, (n, ms) in sorted(agg.items(), key=lambda kv: -kv[1][1])[:18]:
        print(f"{ms/reps:8.3f} ms x{n//reps:<4} {name}")
    return total / reps


def main():
    results = {}
    f = build_step()
    step_ms = slope(f)
    results["step_ms_auto"] = round(step_ms, 2)
    print(f"step (graph_kernel=auto): {step_ms:.2f} ms "
          f"= {B / step_ms * 1e3:,.0f} clips/s", flush=True)
    trace_buckets(f, tag="auto")

    f_xla = build_step(graph_kernel="xla")
    step_xla = slope(f_xla)
    results["step_ms_xla"] = round(step_xla, 2)
    print(f"step (graph_kernel=xla):  {step_xla:.2f} ms "
          f"= {B / step_xla * 1e3:,.0f} clips/s", flush=True)
    trace_buckets(f_xla, tag="xla")

    # analytic roofline: 2 layers x L frames x (cheb k=2 + fused gate dot)
    H, K, GATES, LAYERS = 128, 2, 3, 2
    gate_in = K * H
    per_frame = 2 * B * J * gate_in * (GATES * H) + 2 * B * J * J * H * (K - 1)
    inp_l1 = 2 * B * L * J * (K * 2) * (GATES * H)
    inp_l2 = 2 * B * L * J * gate_in * (GATES * H)
    fwd = LAYERS * L * per_frame + inp_l1 + inp_l2
    train = 3 * fwd  # fwd + dx + dw
    results["analytic_train_gflops"] = round(train / 1e9, 2)
    floor_ms = train / 197e12 * 1e3
    results["mxu_floor_ms"] = round(floor_ms, 3)
    results["pct_of_floor"] = round(100 * floor_ms / step_ms, 1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
