"""Classification metrics: confusion-matrix-derived Accuracy / Precision /
Recall / F1 (micro / macro / none averaging), ConfusionMatrix, and
binned-threshold AUROC / ROC / PR curves.

Replaces the torchmetrics classification stack the reference wires through
``MultiinputWrapper`` (``modules/flow/classification.py:97-158``). States are
additive count tensors, so multi-chip sync is a plain sum — and the AUROC/
curve metrics use fixed-bin score histograms (streaming-friendly and
jit-compatible) instead of storing every prediction.
"""

import jax
import jax.numpy as jnp

from .base import Metric, safe_div

DEFAULT_BINS = 127


def _logits_to_pred_and_score(logits: jnp.ndarray, binary: bool):
    """-> (predicted class (N,), positive-class score (N,) or per-class probs)."""
    if binary or logits.ndim == 1 or logits.shape[-1] == 1:
        score = jax.nn.sigmoid(logits.reshape(logits.shape[0], -1)[:, -1])
        pred = (score > 0.5).astype(jnp.int32)
        return pred, score
    probs = jax.nn.softmax(logits, axis=-1)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32), probs[..., 1]


class ConfusionMatrixMetric(Metric):
    """Counts[target, prediction]; basis for the derived metrics below."""

    def __init__(self, preds_key: str = "crossing_logits",
                 targets_key: str = "crossing", num_classes: int = 2,
                 binary: bool = False):
        self.preds_key = preds_key
        self.targets_key = targets_key
        self.num_classes = num_classes
        self.binary = binary

    def init_state(self):
        return {"confusion": jnp.zeros((self.num_classes, self.num_classes),
                                       jnp.int32)}

    def update(self, state, preds, targets):
        if preds.get(self.preds_key) is None \
                or targets.get(self.targets_key) is None:
            return state
        logits = preds[self.preds_key]
        gt = targets[self.targets_key].reshape(-1).astype(jnp.int32)
        pred, _ = _logits_to_pred_and_score(logits, self.binary)
        idx = gt * self.num_classes + pred
        counts = jnp.bincount(idx, length=self.num_classes ** 2)
        return {"confusion": state["confusion"]
                + counts.reshape(self.num_classes, self.num_classes)}

    def compute(self, state):
        return state["confusion"]


class _DerivedFromConfusion(ConfusionMatrixMetric):
    def __init__(self, *args, average: str = "macro", **kwargs):
        super().__init__(*args, **kwargs)
        self.average = average

    def _stats(self, confusion):
        confusion = confusion.astype(jnp.float32)
        tp = jnp.diagonal(confusion)
        support = confusion.sum(axis=1)       # per true class
        predicted = confusion.sum(axis=0)     # per predicted class
        total = confusion.sum()
        return tp, support, predicted, total

    def _maybe_average(self, per_class, support):
        if self.average == "none":
            return {str(i): per_class[i] for i in range(self.num_classes)}
        if self.average == "weighted":
            return jnp.sum(per_class * support) / jnp.maximum(support.sum(), 1)
        return jnp.mean(per_class)  # macro


class Accuracy(_DerivedFromConfusion):
    def compute(self, state):
        tp, support, predicted, total = self._stats(state["confusion"])
        if self.average == "micro":
            return safe_div(tp.sum(), total)
        per_class = safe_div(tp, support)
        return self._maybe_average(per_class, support)


class Precision(_DerivedFromConfusion):
    def compute(self, state):
        tp, support, predicted, total = self._stats(state["confusion"])
        if self.average == "micro":
            return safe_div(tp.sum(), total)
        per_class = safe_div(tp, predicted)
        return self._maybe_average(per_class, support)


class Recall(_DerivedFromConfusion):
    def compute(self, state):
        tp, support, predicted, total = self._stats(state["confusion"])
        if self.average == "micro":
            return safe_div(tp.sum(), total)
        per_class = safe_div(tp, support)
        return self._maybe_average(per_class, support)


class F1Score(_DerivedFromConfusion):
    def compute(self, state):
        tp, support, predicted, total = self._stats(state["confusion"])
        if self.average == "micro":
            return safe_div(tp.sum(), total)
        precision = safe_div(tp, predicted)
        recall = safe_div(tp, support)
        per_class = safe_div(2 * precision * recall, precision + recall)
        return self._maybe_average(per_class, support)


class _ScoreHistogram(Metric):
    """Positive/negative score histograms over fixed bins — shared state for
    AUROC and the ROC/PR curves."""

    def __init__(self, preds_key: str = "crossing_logits",
                 targets_key: str = "crossing", num_classes: int = 2,
                 binary: bool = False, bins: int = DEFAULT_BINS):
        self.preds_key = preds_key
        self.targets_key = targets_key
        self.binary = binary
        self.bins = bins

    def init_state(self):
        return {"pos": jnp.zeros((self.bins,), jnp.int32),
                "neg": jnp.zeros((self.bins,), jnp.int32)}

    def update(self, state, preds, targets):
        if preds.get(self.preds_key) is None \
                or targets.get(self.targets_key) is None:
            return state
        logits = preds[self.preds_key]
        gt = targets[self.targets_key].reshape(-1).astype(jnp.int32)
        _, score = _logits_to_pred_and_score(logits, self.binary)
        bin_idx = jnp.clip((score * self.bins).astype(jnp.int32),
                           0, self.bins - 1)
        pos = jnp.bincount(jnp.where(gt == 1, bin_idx, self.bins),
                           length=self.bins + 1)[:self.bins]
        neg = jnp.bincount(jnp.where(gt == 0, bin_idx, self.bins),
                           length=self.bins + 1)[:self.bins]
        return {"pos": state["pos"] + pos, "neg": state["neg"] + neg}

    def _curves(self, state):
        # sweep thresholds from high to low: cumulative sums from the top bin
        pos = state["pos"][::-1].astype(jnp.float32)
        neg = state["neg"][::-1].astype(jnp.float32)
        tp = jnp.cumsum(pos)
        fp = jnp.cumsum(neg)
        tpr = safe_div(tp, tp[-1])
        fpr = safe_div(fp, fp[-1])
        precision = safe_div(tp, tp + fp)
        return fpr, tpr, precision


class AUROC(_ScoreHistogram):
    def compute(self, state):
        fpr, tpr, _ = self._curves(state)
        fpr = jnp.concatenate([jnp.zeros(1), fpr])
        tpr = jnp.concatenate([jnp.zeros(1), tpr])
        return jnp.trapezoid(tpr, fpr)


class ROCCurve(_ScoreHistogram):
    def compute(self, state):
        fpr, tpr, _ = self._curves(state)
        return {"fpr": fpr, "tpr": tpr}


class PRCurve(_ScoreHistogram):
    def compute(self, state):
        _, tpr, precision = self._curves(state)
        return {"recall": tpr, "precision": precision}
