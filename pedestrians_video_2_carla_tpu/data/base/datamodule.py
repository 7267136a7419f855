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
                 **kwargs) -> None:
        self.batch_size = batch_size
        self.clip_length = clip_length
        self.data_nodes = data_nodes
        self.input_nodes = input_nodes or data_nodes
        self.transform = transform
        self.needs_confidence = needs_confidence

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
