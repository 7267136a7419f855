"""The jit-compiled input preprocessing graph.

Fuses the reference's per-clip Python dataset pipeline
(``data/base/base_dataset.py:206-234`` + ``projection_2d_mixin.py:209-232``:
augment -> deform (noise + missing joints) -> normalize -> skeleton remap ->
confidence) into one batched pure function of a PRNG key, applied to whole
batches on device — this is BASELINE.json's "jit-compiled preprocessing graph".
"""
from dataclasses import dataclass
from functools import partial
from typing import Dict, Optional, Tuple, Type

import jax
import jax.numpy as jnp
import numpy as np

from ..skeletons.base import Skeleton, get_common_indices
from . import augmentation as A
from . import deformation as D
from . import normalization as N


@dataclass(frozen=True)
class PreprocessingConfig:
    data_nodes: Type[Skeleton]
    input_nodes: Type[Skeleton]
    transform: str = "hips_neck"              # extractor name or "none"
    noise: str = "zero"
    noise_param: float = 1.0
    missing_joint_probabilities: Tuple[float, ...] = ()
    augment_flip: float = 0.0                 # probability (0 = off)
    augment_rotate: float = 0.0               # max degrees (0 = off)
    needs_confidence: bool = False
    has_confidence_channel: bool = False      # raw data carries confidence


def remap_nodes(pose: jnp.ndarray, cfg: PreprocessingConfig) -> jnp.ndarray:
    """data_nodes -> input_nodes gather with zero fill (reference
    ``base_dataset.py:156-191``)."""
    if cfg.data_nodes == cfg.input_nodes:
        return pose
    in_idx, data_idx = get_common_indices(cfg.data_nodes, cfg.input_nodes)
    out = jnp.zeros(pose.shape[:-2] + (len(cfg.input_nodes), pose.shape[-1]),
                    pose.dtype)
    return out.at[..., jnp.asarray(in_idx), :].set(
        pose[..., jnp.asarray(data_idx), :])


@partial(jax.jit, static_argnums=(2, 3))
def process_batch(key: jax.Array,
                  raw_projection_2d: jnp.ndarray,
                  cfg: PreprocessingConfig,
                  training: bool = False,
                  bboxes: Optional[jnp.ndarray] = None,
                  clip_size: Optional[jnp.ndarray] = None
                  ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """(B, L, J_data, 2|3) raw detections -> (model inputs, projection targets).

    Targets (reference ``projection_2d_mixin.py:209-232``): ``projection_2d``
    (augmented clean), ``projection_2d_deformed`` (when deforming),
    ``projection_2d_transformed`` + shift/scale (when normalizing) — all in the
    data skeleton; the returned inputs are remapped to ``input_nodes`` with an
    optional confidence channel.
    """
    k_aug, k_deform = jax.random.split(key)
    targets: Dict[str, jnp.ndarray] = {}

    pose = jnp.asarray(raw_projection_2d)

    # 1. augmentation (training only; carries over to ground truth)
    if training and (cfg.augment_flip or cfg.augment_rotate):
        aug = A.AugmentPose(cfg.data_nodes, flip=cfg.augment_flip or False,
                            rotate=cfg.augment_rotate or False)
        pose, bboxes, params = aug(k_aug, pose, bboxes=bboxes,
                                   clip_size=clip_size)
        targets["is_flipped"] = params.is_flipped
        targets["rotation"] = params.rotation
    targets["projection_2d"] = pose[..., :2]

    # 2. deformation (does NOT carry to ground truth)
    needs_deform = cfg.noise not in ("zero", None) \
        or bool(cfg.missing_joint_probabilities)
    deformed = pose
    if needs_deform:
        probs = jnp.asarray(cfg.missing_joint_probabilities) \
            if cfg.missing_joint_probabilities else None
        deformed = D.deform(k_deform, pose, cfg.noise, cfg.noise_param, probs)
        targets["projection_2d_deformed"] = deformed[..., :2]

    # 3. normalization — the deformed inputs and the clean targets each get
    # their *own* shift/scale (two separate Normalizer invocations in the
    # reference; the saved shift/scale are the clean pose's,
    # ``projection_2d_mixin.py:215-229``)
    inputs = deformed
    # Joint presence must be read off the *pre-normalization* coordinates:
    # dropped joints are exact (0,0) only before the shift/scale moves them
    # (reference ``confidence_mixin.py`` runs on raw detections).
    present = jnp.any(deformed[..., :2] != 0, axis=-1, keepdims=True)
    if cfg.transform not in (None, "none"):
        inputs, _ = N.normalize_with(deformed, cfg.data_nodes,
                                     extractor=cfg.transform)
        clean_norm, clean_ss = N.normalize_with(pose, cfg.data_nodes,
                                                extractor=cfg.transform)
        targets["projection_2d_transformed"] = clean_norm[..., :2]
        targets["projection_2d_shift"] = clean_ss.shift
        targets["projection_2d_scale"] = clean_ss.scale

    # 4. skeleton remap — only the per-joint targets; shape heuristics would
    # misfire on (B, L, 2) shift/scale whenever clip_length == joint count
    per_joint = ("projection_2d", "projection_2d_deformed",
                 "projection_2d_transformed")
    inputs = remap_nodes(inputs, cfg)
    present = remap_nodes(present.astype(inputs.dtype), cfg)
    remapped_targets = {
        k: remap_nodes(v, cfg) if k in per_joint else v
        for k, v in targets.items()
    }

    # 5. confidence channel
    if cfg.needs_confidence and inputs.shape[-1] == 2:
        inputs = jnp.concatenate([inputs, present], axis=-1)
    elif not cfg.needs_confidence and inputs.shape[-1] > 2:
        inputs = inputs[..., :2]

    return inputs, remapped_targets
