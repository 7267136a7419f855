"""Experimental spatial-GNN 2D-pose autoencoders (reference
``modules/movements/spatial_gnn.py:29-175``: PointTransformerConv / GCN
autoencoders over the skeleton graph). Dense-adjacency formulation — see
``models/classification/gnn.py`` for the rationale."""
import flax.linen as nn
import jax
import jax.numpy as jnp

from ...flows.output_types import MovementsModelOutputType
from .common import MovementsModel


class SpatialGnn(MovementsModel):
    """Per-frame attention-based graph autoencoder on the skeleton
    (PointTransformerConv-style: attention weights from relative positions)."""
    hidden_size: int = 32
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.pose_2d

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        adj = jnp.asarray(self.input_nodes.get_adjacency_matrix(
            normalized=False, self_loops=True))
        h = x[..., :2]

        def attn_conv(v, features, name):
            q = nn.Dense(features, name=f"{name}_q")(v)
            k = nn.Dense(features, name=f"{name}_k")(v)
            val = nn.Dense(features, name=f"{name}_v")(v)
            # position-aware attention: scores from query-key differences
            scores = -jnp.sum((q[..., :, None, :] - k[..., None, :, :]) ** 2,
                              axis=-1) / jnp.sqrt(float(features))
            scores = jnp.where(adj > 0, scores, -1e9)
            return jnp.einsum("...ij,...jc->...ic",
                              jax.nn.softmax(scores, -1), val)

        h = nn.relu(attn_conv(h, self.hidden_size, "enc1"))
        h = nn.relu(attn_conv(h, self.hidden_size // 2, "enc2"))
        h = nn.relu(attn_conv(h, self.hidden_size, "dec1"))
        return nn.Dense(2, name="out")(h)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.pose_2d]


class GNNLinearAutoencoder(MovementsModel):
    """GCN encoder + linear decoder per frame (reference ``spatial_gnn.py``)."""
    hidden_size: int = 16
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.pose_2d

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        a_hat = jnp.asarray(self.input_nodes.get_adjacency_matrix())
        h = x[..., :2]

        def gcn(v, features):
            return nn.Dense(features)(
                jnp.einsum("ij,...jc->...ic", a_hat.astype(v.dtype), v))

        h = nn.relu(gcn(h, self.hidden_size))
        z = gcn(h, self.hidden_size // 2)
        B, L, J = x.shape[:3]
        out = nn.Dense(J * 2)(z.reshape(B, L, -1))
        return out.reshape(B, L, J, 2)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.pose_2d]


class VariationalGcn(MovementsModel):
    """Variational GCN autoencoder: GCN encoder to (mu, logvar), reparametrized
    sample, linear decoder (reference ``spatial_gnn.py`` VariationalGcn)."""
    hidden_size: int = 16
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.pose_2d

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        a_hat = jnp.asarray(self.input_nodes.get_adjacency_matrix())
        h = x[..., :2]

        def gcn(v, features):
            return nn.Dense(features)(
                jnp.einsum("ij,...jc->...ic", a_hat.astype(v.dtype), v))

        h = nn.relu(gcn(h, self.hidden_size))
        mu = gcn(h, self.hidden_size // 2)
        logvar = gcn(h, self.hidden_size // 2)
        if training:
            eps = jax.random.normal(self.make_rng("dropout"), mu.shape)
            z = mu + jnp.exp(0.5 * logvar) * eps
        else:
            z = mu
        B, L, J = x.shape[:3]
        out = nn.Dense(J * 2)(z.reshape(B, L, -1))
        return out.reshape(B, L, J, 2)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.pose_2d]
