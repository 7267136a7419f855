#!/usr/bin/env bash
# Run the full test suite in timeout-bounded chunks sized for this box
# (1 vCPU, XLA CPU compiles 2-10 s each; a single pytest invocation of
# everything would run ~45 min with no intermediate evidence). Each chunk
# fits a `timeout 590` budget with headroom as of r5 — re-split a chunk
# if it approaches the cap rather than mistaking the timeout for a hang.
#
# Usage: tools/run_test_chunks.sh [extra pytest args...]
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH="$PWD:/root/.axon_site"

FAILED=0
run() { # name, then pytest selectors
  local name="$1"; shift
  echo "=== chunk: $name ==="
  timeout 590 python -m pytest -q -p no:cacheprovider "$@" || FAILED=1
}

# ~162 s
run ops-core tests/ops \
  --ignore=tests/ops/test_pallas_fused.py \
  --ignore=tests/ops/test_pallas_spatial.py \
  --ignore=tests/ops/test_pallas_temporal.py \
  --ignore=tests/ops/test_pallas_graph_gru.py
# ~300 s
run ops-pallas-a tests/ops/test_pallas_fused.py tests/ops/test_pallas_spatial.py
# ~325 s
run ops-pallas-b tests/ops/test_pallas_temporal.py tests/ops/test_pallas_graph_gru.py
# ~342 s
run models tests/models
# ~211 s (training-loop halves of the CLI flow tests)
run flows-a tests/flows -k "loss_modes or output_types or help_prints or lr_monitor or detect_anomaly or current_lrs or pallas_projection_kernel or pallas_train_projection or pallas_spatial_kernel or lstm_and_weighted or autoencoder_flow or random_run_name or classification_flow or test_and_predict or teacher_force or prevalent_class or resume_from_last"
# ~300 s (sweeps, chains, renderers, precision)
run flows-b tests/flows -k "not (loss_modes or output_types or help_prints or lr_monitor or detect_anomaly or current_lrs or pallas_projection_kernel or pallas_train_projection or pallas_spatial_kernel or lstm_and_weighted or autoencoder_flow or random_run_name or classification_flow or test_and_predict or teacher_force or prevalent_class or resume_from_last)"
# ~264 s
run data-misc tests/data tests/skeletons tests/test_losses.py \
  tests/test_metrics.py tests/test_gym_env.py tests/test_walker_control.py \
  tests/test_bench_contract.py
# ~516 s — the tightest chunk; split runtime out first if it grows
run runtime-serving tests/test_runtime.py tests/test_serving.py \
  tests/test_training.py tests/test_multihost.py tests/golden
# test_parallel: 8 virtual devices + conv models; three chunks (~61/404/? s)
run parallel-a tests/test_parallel.py -k "not dryrun and not sharded_matches_single and not resident_scan_folded"
run parallel-b tests/test_parallel.py -k "pose_lifting_sharded or pallas_projection_sharded or pallas_train_kernel_sharded"
run parallel-c tests/test_parallel.py -k "classification_gnn_sharded or pose_estimation_conv_sharded or fused_temporal_block_sharded or fused_graph_gru_sharded or resident_scan_folded or dryrun"

if [ "$FAILED" -ne 0 ]; then echo "SUITE: FAILURES (see above)"; exit 1; fi
echo "SUITE: all chunks green"
