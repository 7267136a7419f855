"""Input deformation: additive noise + missing-joint dropout, as pure
PRNG-keyed functions (reference ``data/base/mixins/dataset/
projection_2d_mixin.py:137-171`` ``apply_deform``).

Used both as domain-level fault injection (the missing-joints sensitivity study
drives per-joint probabilities) and to simulate OpenPose detection noise when
training on clean synthetic/CARLA data.
"""
from typing import Optional

import jax
import jax.numpy as jnp


def add_noise(key: jax.Array, projection_2d: jnp.ndarray,
              noise: str = "zero", noise_param: float = 1.0) -> jnp.ndarray:
    """Additive gaussian/uniform noise on the (x, y) channels; confidence (if
    present) is untouched."""
    coords = projection_2d[..., :2]
    if noise == "gaussian":
        coords = coords + noise_param * jax.random.normal(
            key, coords.shape, dtype=coords.dtype)
    elif noise == "uniform":
        coords = coords + jax.random.uniform(
            key, coords.shape, dtype=coords.dtype) * noise_param \
            - noise_param / 2.0
    elif noise not in ("zero", None, False):
        raise ValueError(f"Unknown noise type: {noise}")
    if projection_2d.shape[-1] > 2:
        return jnp.concatenate([coords, projection_2d[..., 2:]], axis=-1)
    return coords


def drop_joints(key: jax.Array, projection_2d: jnp.ndarray,
                missing_joint_probabilities: jnp.ndarray) -> jnp.ndarray:
    """Zero out joints with per-joint probabilities (missing-point encoding:
    exact zeros, including the confidence channel)."""
    probs = jnp.asarray(missing_joint_probabilities)
    u = jax.random.uniform(key, projection_2d.shape[:-1],
                           dtype=projection_2d.dtype)
    missing = u < probs
    return jnp.where(missing[..., None], 0.0, projection_2d)


def deform(key: jax.Array, projection_2d: jnp.ndarray,
           noise: str = "zero", noise_param: float = 1.0,
           missing_joint_probabilities: Optional[jnp.ndarray] = None
           ) -> jnp.ndarray:
    k_noise, k_missing = jax.random.split(key)
    out = add_noise(k_noise, projection_2d, noise, noise_param)
    if missing_joint_probabilities is not None:
        out = drop_joints(k_missing, out, missing_joint_probabilities)
    return out
