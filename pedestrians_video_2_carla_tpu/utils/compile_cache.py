"""Persistent XLA compilation cache.

TPU compiles of full train steps cost 20-300 s through the axon tunnel
(and 2-10 s each on CPU); the persistent cache makes every repeated
compile ~free across processes — verified to work through the remote
axon backend. The reference has no equivalent (torch eager + cudnn
autotune); for a jit-everything framework the cache is part of the
production runtime, so the CLI enables it by default.

Cache key includes the HLO and the platform, so CPU/TPU runs coexist in
one directory. Opt out with ``PV2C_NO_COMPILE_CACHE=1``; point elsewhere
with ``JAX_COMPILATION_CACHE_DIR``.
"""
import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_compilation_cache(cache_dir: str = None) -> bool:
    """Idempotently enable the JAX persistent compilation cache.

    Returns True when enabled. Must run before the first compilation to
    cover it (later calls still cover subsequent compiles)."""
    if os.environ.get("PV2C_NO_COMPILE_CACHE"):
        return False
    import jax
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                        _DEFAULT_DIR))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_raise_persistent_cache_errors", False)
        return True
    except Exception:
        return False  # unknown config names on an older jax: run uncached
