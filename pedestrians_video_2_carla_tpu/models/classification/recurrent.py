"""LSTM / GRU classifiers: [Dense emb] + recurrent stack + Dense, last-frame
logits (reference ``modules/classification/lstm.py:9-95``, ``gru.py``)."""
from typing import Optional

import flax.linen as nn

from ..rnn import HoistedGRU, HoistedLSTM
from .common import ClassificationModel


class _RecurrentClassifier(ClassificationModel):
    hidden_size: int = 64
    num_layers: int = 2
    embeddings_size: Optional[int] = None
    p_dropout: float = 0.25
    #: forwarded to the hoisted recurrent layers ("auto" | "pallas" | "xla"
    #: — see models/rnn.py; GRU layers ignore it until a GRU kernel exists)
    rnn_kernel: str = "auto"

    #: hoisted full-sequence layer (models/rnn.py) + the flax-cell name it
    #: must carry for checkpoint compatibility with the previous
    #: nn.RNN(cell) stack
    _layer_cls = None
    _cell_name = None

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        h = x.reshape(B, L, -1)
        if self.embeddings_size:
            h = nn.Dense(self.embeddings_size)(h)
        h = nn.Dropout(self.p_dropout, deterministic=not training)(h)
        for i in range(self.num_layers):
            _, h = self._layer_cls(self.hidden_size, kernel=self.rnn_kernel,
                                   name=f"{self._cell_name}_{i}")(h)
        out = nn.Dense(self.num_classes)(h)
        return out[:, -1, :]


class LSTM(_RecurrentClassifier):
    _layer_cls = HoistedLSTM
    _cell_name = "OptimizedLSTMCell"


class GRU(_RecurrentClassifier):
    _layer_cls = HoistedGRU
    _cell_name = "GRUCell"
