"""Pure-functional metric framework.

Replaces torchmetrics (reference ``metrics/*``) with stateless metric objects
whose accumulator state is an additive pytree of arrays: ``update`` is
jit-compilable, and multi-chip sync is a single ``psum``/host-side tree-sum over
states instead of torchmetrics' ``dist_sync_on_step`` DDP hooks.
"""
from typing import Any, Dict

import jax
import jax.numpy as jnp


class Metric:
    """Interface: additive-state metric.

    ``init_state() -> pytree`` of zeros; ``update(state, preds, targets) ->
    pytree`` (pure); ``compute(state) -> scalar or dict``. Metrics must treat
    missing input keys as a no-op (availability is static per batch pytree).
    """

    def init_state(self) -> Any:
        raise NotImplementedError

    def update(self, state: Any, preds: Dict[str, jnp.ndarray],
               targets: Dict[str, jnp.ndarray]) -> Any:
        raise NotImplementedError

    def compute(self, state: Any):
        raise NotImplementedError


class MetricCollection:
    """Dict of named metrics sharing the update/compute protocol (reference
    used ``torchmetrics.MetricCollection``)."""

    def __init__(self, metrics: Dict[str, Metric]):
        self.metrics = dict(metrics)

    def init_state(self) -> Dict[str, Any]:
        return {name: m.init_state() for name, m in self.metrics.items()}

    def update(self, state: Dict[str, Any], preds, targets) -> Dict[str, Any]:
        return {name: m.update(state[name], preds, targets)
                for name, m in self.metrics.items()}

    def compute(self, state: Dict[str, Any]) -> Dict[str, Any]:
        return {name: m.compute(state[name])
                for name, m in self.metrics.items()}

    def psum(self, state: Dict[str, Any], axis_name: str) -> Dict[str, Any]:
        """Cross-device reduction of accumulator states (inside shard_map/pmap)."""
        return jax.tree_util.tree_map(
            lambda x: jax.lax.psum(x, axis_name), state)

    def tree_sum(self, states) -> Dict[str, Any]:
        """Host-side reduction over a list of states (e.g. per-process)."""
        out = states[0]
        for s in states[1:]:
            out = jax.tree_util.tree_map(lambda a, b: a + b, out, s)
        return out

    def __len__(self):
        return len(self.metrics)

    def items(self):
        return self.metrics.items()


def safe_div(num, den):
    """num/den with 0 where den <= 0. The guard denominator must only kick
    in where den <= 0 — clamping every den below 1 up to 1 would return the
    numerator for fractional denominators (F1's precision+recall < 1)."""
    return jnp.where(den > 0, num / jnp.where(den > 0, den, 1.0), 0.0)
