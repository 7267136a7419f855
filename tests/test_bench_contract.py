"""Contract tests for bench.py's deadline machinery (r3: the r2 bench
timed out at the driver with NO output; the JSON line must now always be
emitted exactly once, whatever happens)."""
import io
import json
import threading
from contextlib import redirect_stdout

import pytest

import bench


@pytest.fixture(autouse=True)
def _detail_file_in_tmp(tmp_path, monkeypatch):
    """_emit() writes BENCH_DETAIL.json to bench._REPO; keep test runs from
    clobbering the repo-root artifact the driver's real bench produces."""
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))


def _fresh(limit_s=100.0):
    bench.DEADLINE = bench._Deadline(limit_s)
    bench.RESULTS.clear()
    bench.TIMINGS.clear()
    bench.SKIPPED.clear()
    bench.HEADLINE.update({"value": None, "vs_baseline": None})
    bench._EMITTED = False


def _emit_and_parse():
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit()
    lines = [l for l in buf.getvalue().splitlines() if l.startswith("{")]
    assert len(lines) == 1
    return json.loads(lines[0])


def test_emit_is_idempotent_and_parseable():
    _fresh()
    bench.HEADLINE["value"] = 123.0
    bench.RESULTS["some_metric"] = 1.5
    bench.SKIPPED.append("late_task")
    d = _emit_and_parse()
    assert d["value"] == 123.0
    assert d["detail"]["some_metric"] == 1.5
    assert d["detail"]["timed_out_after"] == ["late_task"]
    # second call prints nothing
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench._emit()
    assert buf.getvalue() == ""


def test_emit_survives_unserializable_results():
    _fresh()
    bench.HEADLINE["value"] = 7.0
    bench.RESULTS["bad"] = object()  # json.dumps raises
    d = _emit_and_parse()
    assert d["value"] == 7.0
    assert "emit_error" in d["detail"]


def test_run_task_skips_below_budget_and_records_errors():
    _fresh(limit_s=100.0)
    assert bench._run_task("never", lambda: 1, min_budget_s=1e9) is None
    assert "never" in bench.SKIPPED

    def boom():
        raise RuntimeError("x")

    assert bench._run_task("broken", boom, min_budget_s=0) is None
    assert "broken_error" in bench.RESULTS
    assert "broken" in bench.TIMINGS

    def timeouts():
        raise bench.BenchTimeout

    assert bench._run_task("late", timeouts, min_budget_s=0) is None
    assert "late" in bench.SKIPPED
    assert bench._run_task("ok", lambda: 42, min_budget_s=0) == 42


def test_deadline_expiry_skips_remaining_tasks():
    _fresh(limit_s=0.0)  # already expired
    ran = []
    bench._run_task("a", lambda: ran.append(1), min_budget_s=10)
    assert ran == [] and "a" in bench.SKIPPED


def _representative_results():
    """A superset of every key the full 17-task bench can produce, with
    realistic magnitudes (r4 real values where known). Keep this in sync
    when adding bench tasks — the line-length cap below is the driver's
    parse window (VERDICT r4 #1: r4's line outgrew 2000 chars and arrived
    as `parsed: null`)."""
    roof = {"tflops_per_step": 19.85, "mfu_pct": 40.23,
            "flops_note": "includes 9.883 analytic TFLOPs of Pallas kernel "
                          "calls invisible to XLA's cost model",
            "hbm_gb_per_step": 139.72, "hbm_util_pct": 168.12,
            "hbm_note": "bytes-accessed is XLA's pre-fusion estimate; "
                        ">100% = cost-model overcount",
            "peaks_assumed": "TPU v5 lite: 197 TFLOP/s bf16, 819 GB/s"}
    r = {
        "train_step_pallas_train_clips_per_sec": 812345.67,
        "train_step_pallas_train_slope_estimates": [812345.67, 805000.1,
                                                    818000.9],
        "train_step_xla_clips_per_sec": 778376.39,
        "train_step_xla_slope_estimates": [778376.39, 763877.34, 791593.36],
        "cpu_reference_fk_projection_us_per_clip": 10234.5,
        "fused_fk_projection_us_per_clip": 0.419,
        "pallas_fused_fk_projection_us_per_clip": 0.108,
        "resident_pipeline_clips_per_sec": 444955.32,
        "classification_lstm_clips_per_sec": 468512.59,
        "classification_gconvgru_clips_per_sec": 66928.68,
        "classification_lstm_clips_per_sec_bf16": 501234.56,
        "classification_gconvgru_clips_per_sec_bf16": 93456.78,
        "host_pipeline_stream_clips_per_sec": 15202.36,
        "seq2seq_ae_clips_per_sec": 238346.41,
        "seq2seq_ae_clips_per_sec_bf16": 241763.87,
        "serving_infer_clips_per_sec": 1323849.69,
        "serving_infer_us_per_clip": 0.755,
        "serving_infer_pallas_2d_us_per_clip": 0.272,
        "serving_poseformer_us_per_clip": 123.456,
        "serving_poseformer_clips_per_sec": 8123.45,
    }
    for cfg in ("poseformer_B1024", "videopose3d_L81"):
        for sfx in ("", "_bf16"):
            r[f"{cfg}_clips_per_sec{sfx}"] = 13236.29
            r[f"{cfg}_roofline{sfx}"] = dict(roof)
    return r


def test_emitted_line_fits_driver_capture(tmp_path, monkeypatch):
    """The one JSON line must stay under the driver's ~2000-char stdout
    tail window with the FULL result matrix populated; the uncompressed
    matrix must land in BENCH_DETAIL.json."""
    _fresh()
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    bench.HEADLINE.update({"value": 812345.67, "vs_baseline": 24432.1})
    bench.RESULTS.update(_representative_results())
    for i, task in enumerate(
            ("headline_pallas_train cpu_reference_fk fk_micro "
             "poseformer_bf16 videopose3d resident_pipeline classification "
             "classification_bf16 headline_xla host_pipeline pallas_micro "
             "seq2seq_ae serving serving_poseformer poseformer_fp32 "
             "videopose3d_bf16 seq2seq_ae_bf16").split()):
        bench.TIMINGS[task] = 30.0 + i
    d = _emit_and_parse()
    line = json.dumps(d)
    assert len(line) <= bench.MAX_LINE_CHARS, len(line)
    # the headline + every BASELINE config x precision is ON the line
    det = d["detail"]
    assert det["train_step_pallas_train_clips_per_sec"] == 812345.67
    for key in ("poseformer_B1024_clips_per_sec",
                "poseformer_B1024_clips_per_sec_bf16",
                "videopose3d_L81_clips_per_sec",
                "videopose3d_L81_clips_per_sec_bf16",
                "classification_lstm_clips_per_sec",
                "classification_gconvgru_clips_per_sec_bf16",
                "seq2seq_ae_clips_per_sec_bf16",
                "resident_pipeline_clips_per_sec",
                "serving_infer_us_per_clip"):
        assert key in det, key
    # rooflines compressed to short strings, spreads routed to the file
    assert det["poseformer_B1024_roofline"] == "40% MFU, hbm 168%"
    assert "train_step_xla_slope_estimates" not in det
    full = json.loads((tmp_path / bench.DETAIL_FILE).read_text())
    assert full["detail"]["train_step_xla_slope_estimates"] == [
        778376.39, 763877.34, 791593.36]
    assert full["detail"]["task_seconds"]["serving_poseformer"] == 43.0
    assert full["detail"]["poseformer_B1024_roofline"]["mfu_pct"] == 40.23


def test_emitted_line_cap_is_hard(monkeypatch, tmp_path):
    """Even a pathological result set (many long error strings) must stay
    under the cap — keys are dropped, never the line's parseability."""
    _fresh()
    monkeypatch.setattr(bench, "_REPO", str(tmp_path))
    bench.HEADLINE["value"] = 1.0
    for i in range(60):
        bench.RESULTS[f"some_long_task_name_number_{i:02d}_error"] = "x" * 80
    d = _emit_and_parse()
    assert len(json.dumps(d)) <= bench.MAX_LINE_CHARS
    assert d["detail"]["dropped_keys"] > 0
    assert d["detail"]["full_matrix"] == bench.DETAIL_FILE


def test_emit_under_concurrent_results_mutation():
    """The failsafe thread may emit while the main thread mutates RESULTS;
    the line must still come out exactly once."""
    _fresh()
    stop = threading.Event()

    def mutate():
        i = 0
        while not stop.is_set():
            bench.RESULTS[f"k{i % 50}"] = i
            i += 1

    t = threading.Thread(target=mutate, daemon=True)
    t.start()
    try:
        d = _emit_and_parse()
        assert d["metric"] == "pose_lifting_train_clips_per_sec_per_chip"
    finally:
        stop.set()
        t.join(timeout=5)
