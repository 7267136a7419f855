"""Shared movements-model base: a flax module carrying skeleton/output-type
config (reference ``modules/movements/movements.py:8-66`` ``MovementsModel``)."""
from typing import Type

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...flows.output_types import MovementsModelOutputType
from ...skeletons.base import Skeleton
from ...skeletons.carla import CARLA_SKELETON
from ..base import format_movements_output, movements_output_features


class TorchDense(nn.Module):
    """``nn.Dense`` with torch ``nn.Linear``'s default init: kernel
    kaiming-uniform(a=sqrt(5)) = U(+-1/sqrt(fan_in)), bias
    U(+-1/sqrt(fan_in)) — instead of flax's lecun-normal kernel and ZERO
    bias. The init difference is a training-outcome difference, not a
    cosmetic one: with flax defaults the flagship LinearAE fp32 config
    settles into a ~430-540 mm MPJPE basin on the synthetic benchmark while
    the torch reference's best basin is ~200 mm (see
    ``tools/quality_parity.py``); with this init the basins match. Param
    names stay ``kernel``/``bias`` so ``models/torch_import.py`` is
    unaffected."""
    features: int

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (fan_in, self.features))
        bound = 1.0 / np.sqrt(fan_in)
        bias = self.param(
            "bias",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-bound, maxval=bound),
            (self.features,))
        return x @ kernel + bias


def torch_uniform_init(bound: float):
    """``U(-bound, +bound)`` initializer — torch's ``nn.LSTM`` draws every
    weight and bias from ``U(+-1/sqrt(hidden_size))`` and ``nn.Linear`` from
    ``U(+-1/sqrt(fan_in))``; flax's lecun-normal/orthogonal/zero defaults
    train to measurably different basins (see ``docs/quality_parity.json``)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


def torch_lstm_cell(hidden_size: int, name: str = None,
                    **kwargs) -> nn.OptimizedLSTMCell:
    """``OptimizedLSTMCell`` with torch ``nn.LSTM`` default init on all
    kernels and biases."""
    init = torch_uniform_init(1.0 / np.sqrt(hidden_size))
    return nn.OptimizedLSTMCell(
        hidden_size, kernel_init=init, recurrent_kernel_init=init,
        bias_init=init, name=name, **kwargs)


def torch_hoisted_lstm(hidden_size: int, name: str = None, **kwargs):
    """``HoistedLSTM`` (input-projection-hoisted full-sequence layer,
    ``models/rnn.py``) with torch ``nn.LSTM`` default init — parameter-tree
    drop-in for ``nn.RNN(torch_lstm_cell(...))``."""
    from ..rnn import HoistedLSTM

    init = torch_uniform_init(1.0 / np.sqrt(hidden_size))
    return HoistedLSTM(
        hidden_size, kernel_init=init, recurrent_kernel_init=init,
        bias_init=init, name=name, **kwargs)


#: per-joint identity value of each raw output representation
_IDENTITY_FEATURES = {
    MovementsModelOutputType.pose_changes: (1., 0., 0., 0., 1., 0.),
    MovementsModelOutputType.relative_rot: (1., 0., 0., 0., 1., 0.),
    MovementsModelOutputType.absolute_loc: (0., 0., 0.),
    MovementsModelOutputType.absolute_loc_rot:
        (0., 0., 0., 1., 0., 0., 0., 1., 0.),
    MovementsModelOutputType.pose_2d: (0., 0.),
}


def identity_head_dense(features: int,
                        output_type: MovementsModelOutputType,
                        out_joints: int, kernel_scale: float = 0.1,
                        name: str = None) -> nn.Dense:
    """Output head whose init lands in the identity neighborhood of the
    output representation: kernel = 0.1x torch-uniform, bias = the identity
    value tiled per joint (6D identity rotation for pose_changes /
    relative_rot — a ZERO 6D vector would Gram-Schmidt to a zero matrix and
    NaN the FK gradients). Starting from the reference pose removes the
    init-basin lottery (~1 in 3 seeds otherwise settles at ~2.5x the final
    MPJPE on the flagship config; ``docs/quality_parity.json``)."""
    ident = np.tile(np.asarray(_IDENTITY_FEATURES[output_type],
                               np.float32), out_joints)
    assert ident.shape[0] == features

    def bias_init(key, shape, dtype=jnp.float32):
        return jnp.asarray(ident, dtype).reshape(shape)

    return nn.Dense(
        features,
        kernel_init=nn.initializers.variance_scaling(
            kernel_scale ** 2 / 3.0, "fan_in", "uniform"),
        bias_init=bias_init, name=name)


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
