"""Linear + LSTM + Linear movements model (reference
``modules/movements/lstm.py:6-81``; default 2 layers, hidden 64)."""
from typing import Optional

import flax.linen as nn

from ..rnn import HoistedLSTM
from .common import MovementsModel


class LSTM(MovementsModel):
    hidden_size: int = 64
    num_layers: int = 2
    embeddings_size: Optional[int] = None

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        h = x.reshape(B, L, -1)
        if self.embeddings_size:
            h = nn.Dense(self.embeddings_size)(h)
        for i in range(self.num_layers):
            # input-projection-hoisted layer, param-compatible with the
            # previous nn.RNN(OptimizedLSTMCell) stack (models/rnn.py)
            _, h = HoistedLSTM(self.hidden_size,
                               name=f"OptimizedLSTMCell_{i}")(h)
        out = nn.Dense(out_joints * self.output_features)(h)
        return self.format_output(
            out.reshape(B, L, out_joints, self.output_features))
