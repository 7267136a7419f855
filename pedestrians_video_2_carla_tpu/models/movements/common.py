"""Shared movements-model base: a flax module carrying skeleton/output-type
config (reference ``modules/movements/movements.py:8-66`` ``MovementsModel``)."""
from typing import Type

import flax.linen as nn

from ...flows.output_types import MovementsModelOutputType
from ...skeletons.base import Skeleton
from ...skeletons.carla import CARLA_SKELETON
from ..base import format_movements_output, movements_output_features


class MovementsModel(nn.Module):
    """Base for movements models.

    Subclasses get ``input_nodes`` / ``output_nodes`` / ``movements_output_type``
    as module fields and use ``self.output_features`` / ``self.format_output``.
    """
    input_nodes: Type[Skeleton] = CARLA_SKELETON
    output_nodes: Type[Skeleton] = CARLA_SKELETON
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.pose_changes

    #: class-level capability flags (reference BaseModel properties)
    needs_confidence: bool = False
    needs_graph = False
    needs_heatmaps = False
    needs_targets = False

    @property
    def output_type(self) -> MovementsModelOutputType:
        return self.movements_output_type

    @property
    def eval_slice(self):
        """Frame slice that is valid for evaluation (PoseFormer-style models
        trim receptive-field edges)."""
        return slice(None)

    @property
    def input_features(self) -> int:
        return 3 if self.needs_confidence else 2

    @property
    def output_features(self) -> int:
        return movements_output_features(self.movements_output_type)

    def format_output(self, outputs):
        return format_movements_output(outputs, self.movements_output_type)

    @staticmethod
    def supported_output_types():
        return list(MovementsModelOutputType)
