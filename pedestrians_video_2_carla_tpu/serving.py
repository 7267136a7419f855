"""AOT inference export for production serving (TPU-native extension; the
reference has no serving story — its `predict` mode needs the full training
stack in-process).

``export_inference`` bakes a flow's trained parameters into a pure
``(inputs, age_gender_idx) -> preds`` function, lowers it with
``jax.export`` and writes the serialized StableHLO artifact to disk. The
artifact is self-contained: ``load_inference`` deserializes and runs it
without the model class, the flow, or any framework code beyond jax —
suitable for a serving container, and reusable across processes without
re-tracing/re-compiling Python.

The exported function is exactly the flow's eval path minus targets: model
apply -> FK -> camera projection -> metric-prediction dict (the same
tensors ``Trainer.predict`` emits, reference ``base.py:424-436``).
"""
import json
import os
from typing import Any, Callable, Dict, Tuple

import jax
import numpy as np
from jax import export as jax_export


def make_inference_fn(flow, state, output_keys=None
                      ) -> Callable[..., Dict[str, Any]]:
    """Pure inference closure over the trained params/mutables.

    Works for the BaseFlow family (pose_lifting / autoencoder /
    pose_estimation: ``_inner_step`` with empty targets) and for
    ClassificationFlow (logits head).

    ``output_keys`` restricts the returned dict (and therefore what the
    exported computation contains — everything else is dead-code-eliminated
    at lowering). E.g. ``("projection_2d",)`` exports a pure 2D-screen
    artifact with no FK outputs materialized, which pairs with
    ``--projection_kernel pallas`` for the leanest serving graph.
    """
    params = jax.device_get(state.params)
    mutables = jax.device_get(state.mutables)

    if hasattr(flow, "_inner_step"):
        def infer(inputs, age_gender_idx):
            batch = (inputs, {}, {"age_gender_idx": age_gender_idx})
            sliced, _ = flow._inner_step(
                params, mutables, batch, training=False, rngs=None)
            preds = flow._metric_preds(sliced)
            preds = {k: v for k, v in preds.items() if v is not None}
            if output_keys is not None:
                missing = set(output_keys) - set(preds)
                if missing:
                    raise KeyError(
                        f"output_keys {sorted(missing)} not produced by "
                        f"{type(flow).__name__}; available: {sorted(preds)}")
                preds = {k: preds[k] for k in output_keys}
            return preds
        return infer

    def infer(inputs, age_gender_idx):  # ClassificationFlow
        logits, _ = flow._apply(params, mutables, inputs, False, None)
        return {flow.outputs_key: logits}
    return infer


def export_inference(flow, state, sample_inputs, sample_age_gender_idx,
                     path: str, output_keys=None,
                     polymorphic_batch: bool = False) -> str:
    """Serialize the flow's inference function to ``path`` (+ ``.json`` meta).

    By default shapes are fixed to the sample's (static shapes are the TPU
    serving contract anyway — pick the serving batch size here). With
    ``polymorphic_batch=True`` the leading (batch) axis of both inputs is
    exported as the shared symbolic dimension ``b`` (``jax.export``
    shape polymorphism): ONE artifact then serves every batch size, at the
    cost of XLA compiling per distinct runtime batch on first use —
    pair it with bucketed batch sizes in the serving frontend.
    Incompatible with the hand-written Pallas projection kernels, whose
    grids are specialized on the batch extent at trace time.
    """
    infer = make_inference_fn(flow, state, output_keys=output_keys)
    if polymorphic_batch:
        if getattr(flow, "projection_kernel", "xla") != "xla":
            raise ValueError(
                "polymorphic_batch=True requires projection_kernel='xla': "
                "the Pallas kernels specialize their grid on the batch size")
        scope = jax_export.SymbolicScope()
        (b,) = jax_export.symbolic_shape("b", scope=scope)
        args = (jax.ShapeDtypeStruct(
                    (b,) + tuple(np.shape(sample_inputs)[1:]),
                    np.asarray(sample_inputs).dtype),
                jax.ShapeDtypeStruct(
                    (b,) + tuple(np.shape(sample_age_gender_idx)[1:]),
                    np.asarray(sample_age_gender_idx).dtype))
    else:
        args = (jax.ShapeDtypeStruct(np.shape(sample_inputs),
                                     np.asarray(sample_inputs).dtype),
                jax.ShapeDtypeStruct(np.shape(sample_age_gender_idx),
                                     np.asarray(sample_age_gender_idx).dtype))
    try:
        # one artifact serves both CPU (dev/CI) and TPU (production)
        exported = jax_export.export(jax.jit(infer),
                                     platforms=("cpu", "tpu"))(*args)
    except Exception:  # a platform lowering can fail (e.g. custom calls)
        exported = jax_export.export(jax.jit(infer))(*args)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(blob)
    with open(path + ".json", "w") as f:
        json.dump({
            "input_shapes": [[str(d) for d in a.shape] for a in args]
            if polymorphic_batch else
            [list(np.shape(sample_inputs)),
             list(np.shape(sample_age_gender_idx))],
            "input_dtypes": [str(np.asarray(sample_inputs).dtype),
                             str(np.asarray(sample_age_gender_idx).dtype)],
            "flow": type(flow).__name__,
            "platforms": list(exported.platforms),
            "output_keys": sorted(
                jax.eval_shape(infer, *args).keys()),
        }, f, indent=1)
    return path


def load_inference(path: str) -> Tuple[Callable[..., Dict[str, Any]], dict]:
    """-> (callable, meta dict). The callable runs the exported computation
    on the current backend via ``Exported.call`` (jit-compatible)."""
    with open(path, "rb") as f:
        exported = jax_export.deserialize(f.read())
    meta = {}
    if os.path.exists(path + ".json"):
        with open(path + ".json") as f:
            meta = json.load(f)
    return exported.call, meta
