#!/usr/bin/env python
"""Decompose the resident-scan epoch gap (r5, VERDICT r4 weak #3).

BENCH_r04: resident_pipeline 445k clips/s vs train_step_xla 778k on the
same LinearAE B1024 step — a 1.75x tail with no in-artifact explanation.
``lax.scan`` iterations run strictly serially, so the fused body
(gather + preprocess + step per iteration) pays the data path inline on
every step. This probe prices each term with the same multi-epoch
one-sync window methodology as bench.py's resident task:

  step_only   — scan of K bare train steps on one fixed preprocessed
                batch: the folded-step ceiling (should track 778k).
  data_only   — the vmapped K-batch gather+preprocess alone.
  fused       — the r4 runner (prefetch=False): gather in the scan body.
  prefetch    — the r5 runner (prefetch=True): vmapped gather hoisted
                before a scan of bare steps.

Run on the real chip:  python tools/resident_scan_probe.py
"""
import os
import shutil
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pedestrians_video_2_carla_tpu.utils.compile_cache import \
    enable_persistent_compilation_cache

enable_persistent_compilation_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.data.base.hdf5_utils import save_subset
from pedestrians_video_2_carla_tpu.data.base.subsets_datamodule import \
    SubsetsDataModule
from pedestrians_video_2_carla_tpu.flows.pose_lifting import PoseLiftingFlow
from pedestrians_video_2_carla_tpu.losses import LossModes
from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS
from pedestrians_video_2_carla_tpu.runtime.resident_scan import \
    build_scan_runner
from pedestrians_video_2_carla_tpu.utils.rng import training_rng

NUM_CLIPS, BATCH, CLIP, K = 16384, 1024, 16, 16
EPOCHS = 6


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))


def median_rate(run_window, clips_per_window, windows=3):
    """clips/s over a multi-epoch window ending in ONE sync; median of
    ``windows`` runs (tunnel noise made single windows disagree up to
    ~28%: the unexplained 568k-vs-445k r4 spread)."""
    rates = []
    for _ in range(windows):
        t0 = time.perf_counter()
        out = run_window()
        _sync(out)
        rates.append(clips_per_window / (time.perf_counter() - t0))
    rates.sort()
    return rates[len(rates) // 2], [round(r) for r in rates]


def main():
    tmp = tempfile.mkdtemp(prefix="pv2c_resident_probe_")
    try:
        host_rng = np.random.default_rng(0)
        proj = (host_rng.standard_normal(
            (NUM_CLIPS, CLIP, 26, 2)).astype(np.float32) * 60.0
            + np.asarray([400.0, 450.0], np.float32))
        save_subset(os.path.join(tmp, "train.hdf5"), proj, {},
                    {"age": ["adult"] * NUM_CLIPS,
                     "gender": ["female"] * NUM_CLIPS})
        dm = SubsetsDataModule(subsets_dir=tmp, batch_size=BATCH,
                               clip_length=CLIP, transform="hips_neck",
                               device_resident=True)
        dm.prepare_data()
        dm.setup()

        flow = PoseLiftingFlow(
            movements_model=MOVEMENTS_MODELS["LinearAE"](),
            loss_modes=[LossModes.loc_2d],
            movements_optimizer=OptimizerSettings(lr=1e-3))
        batch0 = next(iter(dm.train_batches(0)))
        state0 = flow.init_state(jax.random.PRNGKey(1), batch0)
        rng = training_rng(2)
        spec = dm.resident_scan_inputs("train", shuffle=True,
                                       training=True, seed=1)
        gather, key, order_d, nb, trees = spec
        clips_per_window = EPOCHS * (nb - nb % K) * BATCH

        # --- step_only: scan of K bare steps on a fixed batch ------------
        def step_only_run(state, rng, batch):
            def body(state, _):
                state, logs = flow.training_step(state, batch, rng)
                return state, logs
            return jax.lax.scan(body, state, jnp.arange(K))

        step_only = jax.jit(step_only_run, donate_argnums=(0,))
        sbox = [state0]

        def step_window():
            logs = None
            for _ in range(EPOCHS * (nb // K)):
                sbox[0], logs = step_only(sbox[0], rng, batch0)
            return logs

        step_window()  # compile+warm
        r, spread = median_rate(step_window, clips_per_window)
        print(f"step_only  : {r:,.0f} clips/s  {spread}", flush=True)

        # --- data_only: the vmapped chunk gather+preprocess --------------
        data_only = jax.jit(lambda b0: jax.vmap(
            lambda b: gather(key, order_d, b, *trees))(b0 + jnp.arange(K)))
        data_only(0)

        def data_window():
            out = None
            for e in range(EPOCHS):
                for b0 in range(0, nb - nb % K, K):
                    out = data_only(b0)
            return out

        data_window()
        r, spread = median_rate(data_window, clips_per_window)
        print(f"data_only  : {r:,.0f} clips/s  {spread}", flush=True)

        # --- fused (r4) vs prefetch (r5) runners --------------------------
        for label, prefetch in (("fused   ", False), ("prefetch", True)):
            runner = build_scan_runner(flow, gather, K, prefetch=prefetch)
            box = [flow.init_state(jax.random.PRNGKey(1), batch0)]

            def window():
                logs = None
                for e in range(EPOCHS):
                    sp = dm.resident_scan_inputs("train", shuffle=True,
                                                 training=True, seed=e + 1)
                    _, kkey, order, nb2, tr = sp
                    for b0 in range(0, nb2 - nb2 % K, K):
                        box[0], logs = runner(box[0], rng, kkey, order,
                                              b0, *tr)
                return logs

            window()  # compile+warm
            r, spread = median_rate(window, clips_per_window)
            print(f"{label}   : {r:,.0f} clips/s  {spread}", flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


if __name__ == "__main__":
    main()
