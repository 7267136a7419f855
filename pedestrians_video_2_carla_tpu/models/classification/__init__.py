"""Crossing/action classification models (reference ``modules/classification/``).

The reference's GNN variants ride on torch_geometric(-temporal) sparse ops; the
skeleton graphs here are tiny and static (<=26 nodes), so all graph convolutions
are dense normalized-adjacency matmuls — exactly what the MXU wants.
"""
from .common import ClassificationModel
from .gnn import (DCRNN, GCNBestPaper, GCNBestPaperTransformer, GConvGRU,
                  GConvLSTM, SpatialTemporalGNN, TGCN)
from .recurrent import GRU, LSTM

CLASSIFICATION_MODELS = {
    "GConvLSTM": GConvLSTM,
    "DCRNN": DCRNN,
    "TGCN": TGCN,
    "GConvGRU": GConvGRU,
    "LSTM": LSTM,
    "GRU": GRU,
    "GCNBestPaper": GCNBestPaper,
    "GCNBestPaperTransformer": GCNBestPaperTransformer,
    "SpatialTemporalGNN": SpatialTemporalGNN,
}
