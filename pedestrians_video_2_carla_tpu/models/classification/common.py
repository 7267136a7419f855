"""Classification model base (reference
``modules/classification/classification.py:5-19``)."""
from typing import Type

import flax.linen as nn

from ...flows.output_types import ClassificationModelOutputType
from ...skeletons.base import Skeleton
from ...skeletons.carla import CARLA_SKELETON


class ClassificationModel(nn.Module):
    input_nodes: Type[Skeleton] = CARLA_SKELETON
    num_classes: int = 2
    input_features: int = 2

    needs_confidence: bool = False
    needs_graph = False
    needs_targets = False

    @property
    def output_type(self) -> ClassificationModelOutputType:
        return ClassificationModelOutputType.multiclass
