"""Movements models (2D pose clip -> pose changes / rotations / 3D locations /
2D pose). Registry mirrors reference ``modules/flow/pose_lifting.py:38-86``."""
from .common import MovementsModel
from .linear import Linear
from .linear_ae import LinearAE, LinearAE2D, LinearAEResidual, LinearAEResidualLeaky
from .lstm import LSTM
from .zero import ZeroMovements

MOVEMENTS_MODELS = {
    m.__name__: m for m in [
        ZeroMovements, Linear, LSTM, LinearAE, LinearAE2D,
        LinearAEResidual, LinearAEResidualLeaky,
    ]
}


def register_movements_model(cls):
    MOVEMENTS_MODELS[cls.__name__] = cls
    return cls
