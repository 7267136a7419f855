"""Minimal datamodule interface the trainer consumes.

The reference builds on Lightning's DataModule + torch DataLoaders
(``data/base/base_datamodule.py``); here a datamodule is anything that yields
``(inputs, targets, meta)`` batch pytrees of numpy/JAX arrays:

* ``inputs``  — (B, L, J, 2|3) float32
* ``targets`` — dict of (B, ...) arrays (static key set per datamodule)
* ``meta``    — dict; must include ``age_gender_idx`` (B,) int32 for the
  projection module's reference-skeleton gather

Batches cross the host->device boundary at the trainer, which also shards them
over the mesh's data axis.
"""
from typing import Any, Dict, Iterator, Optional, Tuple, Type

from ...skeletons.base import Skeleton
from ...skeletons.carla import CARLA_SKELETON

Batch = Tuple[Any, Dict[str, Any], Dict[str, Any]]


class BaseDataModule:
    #: subclasses that generate infinite train streams set this (triggers the
    #: limit_train_batches guard, reference ``modeling.py:366-381``)
    @classmethod
    def uses_infinite_train_set(cls) -> bool:
        return False

    def __init__(self,
                 batch_size: int = 64,
                 clip_length: int = 30,
                 data_nodes: Type[Skeleton] = CARLA_SKELETON,
                 input_nodes: Optional[Type[Skeleton]] = None,
                 transform: str = "hips_neck",
                 needs_confidence: bool = False,
                 outputs_dir: str = "outputs",
                 **kwargs) -> None:
        self.batch_size = batch_size
        self.clip_length = clip_length
        self.data_nodes = data_nodes
        self.input_nodes = input_nodes or data_nodes
        self.transform = transform
        self.needs_confidence = needs_confidence
        self.outputs_dir = outputs_dir

    # -- lifecycle ---------------------------------------------------------
    def prepare_data(self) -> None:
        """One-time, single-process preparation (subset extraction/caching)."""

    def setup(self, stage: Optional[str] = None) -> None:
        """Per-stage dataset construction."""

    # -- iteration ---------------------------------------------------------
    def train_batches(self, seed: int = 0) -> Iterator[Batch]:
        raise NotImplementedError

    def val_batches(self) -> Iterator[Batch]:
        raise NotImplementedError

    def test_batches(self) -> Iterator[Batch]:
        raise NotImplementedError

    def predict_batches(self, set_name: str) -> Iterator[Batch]:
        if set_name == "train":
            return self.train_batches()
        return self.val_batches() if set_name == "val" else self.test_batches()

    # -- sizes (None = unknown/infinite) ----------------------------------
    @property
    def train_set_size(self) -> Optional[int]:
        return None

    @property
    def val_set_size(self) -> Optional[int]:
        return None

    @property
    def test_set_size(self) -> Optional[int]:
        return None

    @property
    def transform_is_identity(self) -> bool:
        return self.transform in (None, "none")

    # -- predictions-as-dataset chaining -----------------------------------
    def save_predictions(self, set_name: str, outputs, run_id: str = "run"
                         ) -> str:
        """Denormalize predicted 2D poses and write an HDF5 subsets tree
        loadable by ``SubsetsDataModule`` for flow chaining (reference
        ``base_datamodule.py:560-630``).

        :param outputs: list of ``(preds, targets, meta)`` numpy pytrees as
            returned by ``Trainer.predict``.
        """
        import os

        import numpy as np

        from ...ops import normalization as N
        from .hdf5_utils import save_subset

        digest = getattr(self, "settings_digest", "predictions")
        save_dir = os.path.join(
            self.outputs_dir, f"{type(self).__name__}Predictions",
            "subsets", digest, run_id)
        os.makedirs(save_dir, exist_ok=True)

        if not outputs:
            raise ValueError(
                f"save_predictions({set_name!r}): Trainer.predict yielded no "
                f"batches — the subset is empty or every batch was dropped "
                f"(e.g. undecodable videos); nothing to save")
        all_proj, all_targets, all_meta = [], [], []
        for preds, targets, meta in outputs:
            key = "projection_2d_transformed" \
                if preds.get("projection_2d_transformed") is not None \
                else "projection_2d"
            pred_pose = np.asarray(preds[key])[..., :2]
            if key == "projection_2d_transformed" \
                    and targets.get("projection_2d_shift") is not None:
                ss = N.ShiftScale(
                    np.asarray(targets["projection_2d_shift"]),
                    np.asarray(targets["projection_2d_scale"]))
                pred_pose = np.asarray(N.denormalize(pred_pose, ss))
            all_proj.append(pred_pose)
            all_targets.append({
                k: np.asarray(v) for k, v in targets.items()
                if not k.startswith("projection_2d")
                and hasattr(v, "shape")})
            all_meta.append({k: np.asarray(v) for k, v in (meta or {}).items()
                             if hasattr(v, "shape")})

        projection_2d = np.concatenate(all_proj)
        merged_targets = {}
        for k in all_targets[0].keys():
            try:
                merged_targets[k] = np.concatenate(
                    [t[k] for t in all_targets])
            except (ValueError, KeyError):
                continue
        merged_meta = {}
        for k in (all_meta[0].keys() if all_meta else []):
            try:
                merged_meta[k] = np.concatenate([m[k] for m in all_meta])
            except (ValueError, KeyError):
                continue
        save_subset(os.path.join(save_dir, f"{set_name}.hdf5"),
                    projection_2d, merged_targets, merged_meta)

        # a dparams.yaml makes the tree directly consumable as a subsets_dir
        import yaml
        params_path = os.path.join(save_dir, "dparams.yaml")
        sizes = {}
        if os.path.exists(params_path):
            with open(params_path) as f:
                sizes = yaml.safe_load(f) or {}
        sizes[f"{set_name}_set_size"] = int(len(projection_2d))
        sizes.setdefault("data_module_name",
                         f"{type(self).__name__}Predictions")
        sizes.setdefault("clip_length", self.clip_length)
        sizes.setdefault("data_nodes", self.data_nodes.__name__)
        with open(params_path, "w") as f:
            yaml.safe_dump(sizes, f)
        return save_dir

    @property
    def hparams(self) -> Dict[str, Any]:
        return {
            "data_module_name": type(self).__name__,
            "batch_size": self.batch_size,
            "clip_length": self.clip_length,
            "data_nodes": self.data_nodes.__name__,
            "input_nodes": self.input_nodes.__name__,
            "transform": self.transform,
        }
