"""Synthetic Carla2D3D data: random pose twitches on the reference skeletons,
rendered to 2D ground truth through the differentiable FK+projection pipeline.

Re-designs reference ``data/carla/datasets/carla_2d3d_dataset.py:100-210`` +
``datamodules/carla_2d3d_datamodule.py``: instead of per-worker Python loops
generating batches on CPU, ``generate_batch`` is a jit-compiled pure function
of a PRNG key — the infinite train stream is deterministic, reproducible and
generated *on device* (on TPU the synthetic data never touches the host).
Fixed val/test sets are derived from fixed seeds instead of pre-generated HDF5
(equivalent reproducibility without the cache files).
"""
from dataclasses import dataclass
from functools import partial
from typing import Iterator, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ...flows.output_types import MovementsModelOutputType
from ...ops import deformation as D
from ...ops import normalization as N
from ...ops.projection import ProjectionModule, projection_state_for
from ...ops.rotations import euler_angles_to_matrix
from ...skeletons.carla import AGE_GENDER_KEYS, CARLA_SKELETON
from ..base.datamodule import BaseDataModule


@dataclass(frozen=True)
class Carla2D3DConfig:
    batch_size: int = 64
    clip_length: int = 30
    random_changes_each_frame: int = 3
    max_change_in_deg: float = 5.0
    max_world_rot_change_in_deg: float = 0.0
    max_initial_world_rot_change_in_deg: float = 0.0
    noise: str = "zero"
    noise_param: float = 1.0
    missing_joint_probabilities: Tuple[float, ...] = ()
    transform: str = "hips_neck"
    needs_confidence: bool = False
    val_set_size: int = 64
    test_set_size: int = 64


def _random_pose_changes(key, cfg: Carla2D3DConfig):
    """Per-frame euler twitches on ``random_changes_each_frame`` random joints
    (selection without replacement via top-k of uniform scores)."""
    J = len(CARLA_SKELETON)
    B, L, k = cfg.batch_size, cfg.clip_length, cfg.random_changes_each_frame
    k_sel, k_ang = jax.random.split(key)
    scores = jax.random.uniform(k_sel, (B, L, J))
    threshold = jnp.sort(scores, axis=-1)[..., J - k, None]
    chosen = scores >= threshold  # exactly k joints per (b, l)
    angles = (jax.random.uniform(k_ang, (B, L, J, 3)) * 2.0 - 1.0) \
        * np.deg2rad(cfg.max_change_in_deg)
    angles = jnp.where(chosen[..., None], angles, 0.0)
    return euler_angles_to_matrix(angles, "XYZ")


@partial(jax.jit, static_argnums=(1,))
def generate_batch(key: jax.Array, cfg: Carla2D3DConfig):
    """One synthetic batch: ``(inputs, targets, meta)`` (all on device)."""
    k_pose, k_rot0, k_rot, k_ag, k_deform, k_label = jax.random.split(key, 6)
    B, L = cfg.batch_size, cfg.clip_length

    pose_changes = _random_pose_changes(k_pose, cfg)

    world_rot_euler = jnp.zeros((B, L, 3))
    if cfg.max_initial_world_rot_change_in_deg > 0:
        yaw0 = (jax.random.uniform(k_rot0, (B,)) * 2 - 1) \
            * np.deg2rad(cfg.max_initial_world_rot_change_in_deg)
        world_rot_euler = world_rot_euler.at[:, 0, 2].set(yaw0)
    if cfg.max_world_rot_change_in_deg != 0.0:
        yaws = (jax.random.uniform(k_rot, (B, L - 1)) * 2 - 1) \
            * np.deg2rad(cfg.max_world_rot_change_in_deg)
        world_rot_euler = world_rot_euler.at[:, 1:, 2].set(yaws)
    world_rot_changes = euler_angles_to_matrix(world_rot_euler, "XYZ")
    world_loc_changes = jnp.zeros((B, L, 3))

    age_gender_idx = jax.random.randint(k_ag, (B,), 0, len(AGE_GENDER_KEYS))
    state = projection_state_for(age_gender_idx)
    projection = ProjectionModule(MovementsModelOutputType.pose_changes)
    projection_2d, outputs = projection(
        state, pose_changes, world_loc_changes, world_rot_changes)

    targets = {
        "projection_2d": projection_2d[..., :2],
        "pose_changes": pose_changes,
        "world_loc_changes": world_loc_changes,
        "world_rot_changes": world_rot_changes,
        **{k: v for k, v in outputs.items() if v is not None},
    }
    targets["absolute_pose_loc"] = outputs["absolute_pose_loc"]
    # synthetic binary label so classification flows can run against this
    # datamodule (the reference's synthetic generator has no class labels;
    # its classification tests need real JAAD fixtures)
    targets["crossing"] = jax.random.bernoulli(
        k_label, 0.5, (B,)).astype(jnp.int32)

    inputs = projection_2d[..., :2]
    if cfg.noise != "zero" or cfg.missing_joint_probabilities:
        probs = jnp.asarray(cfg.missing_joint_probabilities) \
            if cfg.missing_joint_probabilities else None
        inputs = D.deform(k_deform, inputs, cfg.noise, cfg.noise_param, probs)
        targets["projection_2d_deformed"] = inputs

    if cfg.transform not in (None, "none"):
        normalized, _ = N.normalize_with(
            inputs, CARLA_SKELETON, extractor=cfg.transform)
        # clean targets use their own shift/scale (reference
        # projection_2d_mixin.py:215-229 semantics)
        clean_norm, clean_ss = N.normalize_with(
            targets["projection_2d"], CARLA_SKELETON, extractor=cfg.transform)
        targets["projection_2d_transformed"] = clean_norm[..., :2]
        targets["projection_2d_shift"] = clean_ss.shift
        targets["projection_2d_scale"] = clean_ss.scale
        inputs = normalized

    if cfg.needs_confidence:
        present = jnp.any(inputs[..., :2] != 0, axis=-1, keepdims=True)
        inputs = jnp.concatenate(
            [inputs, present.astype(inputs.dtype)], axis=-1)

    meta = {"age_gender_idx": age_gender_idx}
    return inputs, targets, meta


class Carla2D3DDataModule(BaseDataModule):
    default_data_nodes = CARLA_SKELETON
    """Infinite synthetic train stream + fixed-seed val/test sets."""

    @classmethod
    def uses_infinite_train_set(cls) -> bool:
        return True

    def __init__(self, val_set_size: int = 64, test_set_size: int = 64,
                 random_changes_each_frame: int = 3,
                 max_change_in_deg: float = 5.0,
                 max_world_rot_change_in_deg: float = 0.0,
                 max_initial_world_rot_change_in_deg: float = 0.0,
                 noise: str = "zero", noise_param: float = 1.0,
                 missing_joint_probabilities=(), seed: int = 22742,
                 **kwargs) -> None:
        kwargs.setdefault("data_nodes", CARLA_SKELETON)
        super().__init__(**kwargs)
        self.seed = seed
        self._val_size = val_set_size
        self._test_size = test_set_size
        self.config = Carla2D3DConfig(
            batch_size=self.batch_size,
            clip_length=self.clip_length,
            random_changes_each_frame=random_changes_each_frame,
            max_change_in_deg=max_change_in_deg,
            max_world_rot_change_in_deg=max_world_rot_change_in_deg,
            max_initial_world_rot_change_in_deg=max_initial_world_rot_change_in_deg,
            noise=noise, noise_param=noise_param,
            missing_joint_probabilities=tuple(missing_joint_probabilities or ()),
            transform=self.transform,
            needs_confidence=self.needs_confidence,
        )

    def _batches_from(self, base_key, num_batches) -> Iterator:
        for i in range(num_batches):
            yield generate_batch(jax.random.fold_in(base_key, i), self.config)

    def train_batches(self, seed: int = 0) -> Iterator:
        key = jax.random.PRNGKey(self.seed + 1000 + seed)
        i = 0
        while True:
            yield generate_batch(jax.random.fold_in(key, i), self.config)
            i += 1

    def val_batches(self) -> Iterator:
        num = max(1, self._val_size // self.batch_size)
        return self._batches_from(jax.random.PRNGKey(self.seed + 1), num)

    def test_batches(self) -> Iterator:
        num = max(1, self._test_size // self.batch_size)
        return self._batches_from(jax.random.PRNGKey(self.seed + 2), num)

    def predict_batches(self, set_name: str) -> Iterator:
        if set_name == "train":
            # the train stream is infinite; predict over a reproducible
            # finite slice sized like the limit_train_batches guard
            num = max(1, 4 * self.val_set_size // self.batch_size)
            return self._batches_from(
                jax.random.PRNGKey(self.seed + 1000), num)
        return super().predict_batches(set_name)

    @property
    def val_set_size(self):
        return max(1, self._val_size // self.batch_size) * self.batch_size

    @property
    def test_set_size(self):
        return max(1, self._test_size // self.batch_size) * self.batch_size

    @property
    def hparams(self):
        return {**super().hparams,
                "random_changes_each_frame": self.config.random_changes_each_frame,
                "max_change_in_deg": self.config.max_change_in_deg,
                "noise": self.config.noise,
                "missing_joint_probabilities":
                    list(self.config.missing_joint_probabilities)}
