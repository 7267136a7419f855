"""Contract tests for bench.py's deadline machinery (r3: the r2 bench
timed out at the driver with NO output; the JSON line must now always be
emitted exactly once, whatever happens)."""
import io
import json
import threading
from contextlib import redirect_stdout

import bench


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
