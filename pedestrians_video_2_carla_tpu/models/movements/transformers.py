"""SimpleTransformer: 6-layer post-norm transformer encoder over frames with
d_model = J * features (reference ``modules/movements/transformers.py:7-54``,
torch ``nn.TransformerEncoder`` defaults: 4 heads, ffn 2048, post-LN, ReLU,
LayerNorm eps 1e-5)."""
import flax.linen as nn

from ...flows.output_types import MovementsModelOutputType
from .common import MovementsModel


class _EncoderLayer(nn.Module):
    """torch ``TransformerEncoderLayer`` (post-norm) equivalent."""
    d_model: int
    n_heads: int
    dim_feedforward: int = 2048
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, training: bool = False):
        attn = nn.MultiHeadDotProductAttention(
            num_heads=self.n_heads, qkv_features=self.d_model,
            dropout_rate=self.dropout, deterministic=not training)(x, x)
        x = nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(
            self.dropout, deterministic=not training)(attn))
        ff = nn.Dense(self.dim_feedforward)(x)
        ff = nn.relu(ff)
        ff = nn.Dropout(self.dropout, deterministic=not training)(ff)
        ff = nn.Dense(self.d_model)(ff)
        return nn.LayerNorm(epsilon=1e-5)(x + nn.Dropout(
            self.dropout, deterministic=not training)(ff))


class SimpleTransformer(MovementsModel):
    n_heads: int = 4
    num_layers: int = 6
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.pose_2d

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L, J, C = x.shape
        d_model = J * self.output_features
        if d_model % self.n_heads != 0:
            raise ValueError(
                f"d_model ({d_model}) must be divisible by n_heads")
        h = x[..., :self.output_features].reshape(B, L, d_model)
        for _ in range(self.num_layers):
            h = _EncoderLayer(d_model, self.n_heads)(h, training)
        return h.reshape(B, L, J, self.output_features)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.pose_2d]
