"""LSTM / GRU classifiers: [Dense emb] + recurrent stack + Dense, last-frame
logits (reference ``modules/classification/lstm.py:9-95``, ``gru.py``)."""
from typing import Optional

import flax.linen as nn

from .common import ClassificationModel


class _RecurrentClassifier(ClassificationModel):
    hidden_size: int = 64
    num_layers: int = 2
    embeddings_size: Optional[int] = None
    p_dropout: float = 0.25

    def _cell(self):
        raise NotImplementedError

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        h = x.reshape(B, L, -1)
        if self.embeddings_size:
            h = nn.Dense(self.embeddings_size)(h)
        h = nn.Dropout(self.p_dropout, deterministic=not training)(h)
        for _ in range(self.num_layers):
            h = nn.RNN(self._cell())(h)
        out = nn.Dense(self.num_classes)(h)
        return out[:, -1, :]


class LSTM(_RecurrentClassifier):
    def _cell(self):
        return nn.OptimizedLSTMCell(self.hidden_size)


class GRU(_RecurrentClassifier):
    def _cell(self):
        return nn.GRUCell(self.hidden_size)
