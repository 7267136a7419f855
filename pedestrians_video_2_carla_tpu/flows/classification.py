"""Crossing/action classification flow (reference
``modules/flow/classification.py:41-596``): classifier -> logits -> BCE/CE loss,
confusion-matrix metric stack, last-frame labels."""
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..metrics.base import MetricCollection
from ..metrics.classification import (AUROC, Accuracy, ConfusionMatrixMetric,
                                      F1Score, PRCurve, Precision, ROCCurve,
                                      Recall)
from ..models.base import OptimizerSettings
from ..models.classification import CLASSIFICATION_MODELS
from .base import BaseFlow, FlowState
from .output_types import ClassificationModelOutputType


class ClassificationFlow:
    def __init__(self,
                 classification_model=None,
                 classification_targets_key: str = "crossing",
                 classification_average: str = "macro",
                 num_classes: int = 2,
                 classification_optimizer: Optional[OptimizerSettings] = None,
                 transform: str = "hips_neck",
                 gradient_clip_val: float = 0.0,
                 precision: str = "32",
                 steps_per_epoch: int = 1,
                 **kwargs) -> None:
        self.gradient_clip_val = float(gradient_clip_val or 0.0)
        #: see flows/base.py — epoch-granularity LR schedulers scale by this
        self.steps_per_epoch = max(1, int(steps_per_epoch))
        #: AMP-style mixed precision — see flows/base.py (same contract)
        self.precision = "bf16" if str(precision) in ("16", "bf16") else "32"
        if classification_model is None:
            classification_model = CLASSIFICATION_MODELS["LSTM"]()
        self.classification_model = classification_model
        self.targets_key = classification_targets_key
        self.outputs_key = classification_targets_key + "_logits"
        self.num_classes = num_classes
        self.transform = transform
        self.classification_optimizer = classification_optimizer \
            or OptimizerSettings()

        if classification_average == "benchmark":
            # PedestrianActionBenchmark protocol (reference
            # ``classification.py:59-75``)
            self.average = {"Accuracy": "micro", "Precision": "none",
                            "Recall": "none", "F1Score": "none"}
        else:
            self.average = {k: classification_average for k in
                            ("Accuracy", "Precision", "Recall", "F1Score")}

        self.binary = (num_classes == 2 and self.classification_model.
                       output_type == ClassificationModelOutputType.binary)
        self.requested_loss_modes: List = []
        self.metrics = MetricCollection(self.get_metrics())
        self.initial_metrics = MetricCollection(self.get_metrics())

    @classmethod
    def get_available_models(cls):
        return {"classification": dict(CLASSIFICATION_MODELS)}

    @classmethod
    def get_default_models(cls):
        return {"classification": CLASSIFICATION_MODELS["LSTM"]}

    @property
    def needs_graph(self):
        # dense-adjacency GNNs consume the same (B, L, J, C) batches
        return False

    @property
    def needs_heatmaps(self):
        return False

    @property
    def needs_confidence(self):
        return getattr(self.classification_model, "needs_confidence", False)

    def get_metrics(self) -> Dict[str, Any]:
        kw = dict(preds_key=self.outputs_key, targets_key=self.targets_key,
                  num_classes=self.num_classes, binary=self.binary)
        hist_kw = dict(preds_key=self.outputs_key,
                       targets_key=self.targets_key, binary=self.binary)
        metrics = {
            "Accuracy": Accuracy(average=self.average["Accuracy"], **kw),
            "Precision": Precision(average=self.average["Precision"], **kw),
            "Recall": Recall(average=self.average["Recall"], **kw),
            "F1Score": F1Score(average=self.average["F1Score"], **kw),
            "ConfusionMatrix": ConfusionMatrixMetric(**kw),
        }
        if self.num_classes <= 2:
            # score-histogram metrics are BINARY curves (positive-class
            # probability); for num_classes > 2 they would silently degrade
            # to a class-1-vs-rest curve, so they are omitted instead (the
            # reference's crossing task — the only consumer — is binary)
            metrics.update({
                "AUROC": AUROC(**hist_kw),
                # curve metrics (reference logs these as W&B plots,
                # ``classification.py:336-436``; here they land in the
                # JSONL/TB summaries as binned arrays)
                "ROC": ROCCurve(**hist_kw),
                "PRCurve": PRCurve(**hist_kw),
            })
        return metrics

    def initial_preds(self, inputs, targets):
        """Prevalent-class predictor baseline (reference
        ``classification.py:259-319``)."""
        import jax.numpy as jnp
        labels = targets.get(self.targets_key)
        if labels is None:
            return {}
        flat = labels.reshape(-1).astype(jnp.int32)
        counts = jnp.bincount(flat, length=self.num_classes)
        prevalent = jnp.argmax(counts)
        if self.binary:
            # scalar logit per sample: +5 if the prevalent class is 1
            logits = jnp.where(prevalent == 1, 5.0, -5.0) \
                * jnp.ones((flat.shape[0],), jnp.float32)
        else:
            logits = jax.nn.one_hot(
                jnp.full((flat.shape[0],), prevalent),
                self.num_classes) * 10.0 - 5.0
        return {self.outputs_key: logits}

    def on_epoch_start(self, epoch: int) -> bool:
        return False

    # -- state -------------------------------------------------------------
    def optimizer_settings_map(self) -> Dict[str, OptimizerSettings]:
        return {"classification": self.classification_optimizer}

    # lr monitoring / model summary share BaseFlow's generic implementations
    # (they only rely on optimizer_settings_map and state.params)
    current_lrs = BaseFlow.current_lrs
    param_counts = BaseFlow.param_counts

    def init_state(self, key: jax.Array, sample_batch) -> FlowState:
        inputs, targets, meta = sample_batch
        k_model, k_drop = jax.random.split(key)
        variables = self.classification_model.init(
            {"params": k_model, "dropout": k_drop}, inputs, training=False)
        params = {"classification": variables.get("params", {})}
        mutables = {"classification": {k: v for k, v in variables.items()
                                       if k != "params"}}
        tx = self.classification_optimizer.make(self.steps_per_epoch)
        if self.gradient_clip_val > 0:
            tx = optax.chain(
                optax.clip_by_global_norm(self.gradient_clip_val), tx)
        self._tx = optax.with_extra_args_support(tx)
        opt_state = self._tx.init(params)
        return FlowState(params=params, mutables=mutables,
                         opt_state=opt_state, step=jnp.zeros((), jnp.int32))

    # -- steps --------------------------------------------------------------
    def _apply(self, params, mutables, inputs, training, rngs):
        from .base import BaseFlow
        half = self.precision == "bf16"
        cls_params = params["classification"]
        cls_mutables = mutables["classification"]
        if half:
            cls_params = BaseFlow._cast_floats(cls_params, jnp.bfloat16)
            inputs = BaseFlow._cast_floats(inputs, jnp.bfloat16)
        variables = {"params": cls_params, **cls_mutables}
        mutable_keys = [k for k in cls_mutables if cls_mutables[k]]
        kwargs = {"rngs": rngs} if rngs else {}
        if training and mutable_keys:
            logits, updated = self.classification_model.apply(
                variables, inputs, training=training, mutable=mutable_keys,
                **kwargs)
            if half:
                logits = BaseFlow._cast_floats(logits, jnp.float32)
                updated = jax.tree_util.tree_map(
                    lambda o, n: n.astype(o.dtype)
                    if hasattr(o, "dtype") else n, cls_mutables, updated)
            return logits, {"classification": updated}
        logits = self.classification_model.apply(
            variables, inputs, training=training, **kwargs)
        if half:
            logits = BaseFlow._cast_floats(logits, jnp.float32)
        return logits, mutables

    def _loss(self, logits, targets):
        labels = targets[self.targets_key].reshape(-1)
        if self.binary:
            return optax.sigmoid_binary_cross_entropy(
                logits.reshape(-1), labels.astype(logits.dtype)).mean()
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels.astype(jnp.int32)).mean()

    def training_step(self, state: FlowState, batch, rng: jax.Array
                      ) -> Tuple[FlowState, Dict[str, jnp.ndarray]]:
        inputs, targets, meta = batch
        dropout_rng = jax.random.fold_in(rng, state.step)

        def loss_fn(params):
            logits, new_mutables = self._apply(
                params, state.mutables, inputs, True,
                {"dropout": dropout_rng})
            return self._loss(logits, targets), new_mutables

        (loss, new_mutables), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = self._tx.update(
            grads, state.opt_state, state.params, value=loss)
        new_params = optax.apply_updates(state.params, updates)
        logs = {"train_loss/primary": loss}
        return FlowState(params=new_params, mutables=new_mutables,
                         opt_state=new_opt_state,
                         step=state.step + 1), logs

    def eval_step(self, state: FlowState, batch):
        inputs, targets, meta = batch
        logits, _ = self._apply(state.params, state.mutables, inputs,
                                False, None)
        loss = self._loss(logits, targets)
        preds = {self.outputs_key: logits}
        return {"classification": loss, "primary": loss}, preds, targets
