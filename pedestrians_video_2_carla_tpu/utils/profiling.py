"""Tracing & profiling: perf-counter accumulation decorator (reference
``utils/timing.py:10-30``) plus first-class ``jax.profiler`` integration the
reference lacked (SURVEY.md §5: "expose jax.profiler trace + per-step timing
natively")."""
import contextlib
import functools
import time
from collections import defaultdict
from typing import Dict

_TIMINGS: Dict[str, list] = defaultdict(lambda: [0.0, 0])


def timing(fn):
    """Accumulate wall time per function (reference ``@timing``)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        try:
            return fn(*args, **kwargs)
        finally:
            entry = _TIMINGS[f"{fn.__module__}.{fn.__qualname__}"]
            entry[0] += time.perf_counter() - t0
            entry[1] += 1
    return wrapper


@contextlib.contextmanager
def timed(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        entry = _TIMINGS[name]
        entry[0] += time.perf_counter() - t0
        entry[1] += 1


def get_timings() -> Dict[str, Dict[str, float]]:
    return {k: {"total_s": v[0], "calls": v[1],
                "mean_ms": v[0] / max(v[1], 1) * 1e3}
            for k, v in _TIMINGS.items()}


def print_timing() -> None:
    for name, t in sorted(get_timings().items()):
        print(f"{name}: {t['total_s']:.3f}s over {t['calls']} calls "
              f"({t['mean_ms']:.2f} ms/call)")


def reset_timings() -> None:
    _TIMINGS.clear()


@contextlib.contextmanager
def device_trace(log_dir: str, host_trace: bool = True):
    """Capture a jax.profiler trace (xplane; viewable in TensorBoard or
    Perfetto) around a code region."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region that shows up in device traces."""
    import jax
    return jax.profiler.TraceAnnotation(name)
