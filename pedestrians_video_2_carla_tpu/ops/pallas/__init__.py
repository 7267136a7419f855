"""Hand-written Pallas TPU kernels for the hot compute paths."""
from .fused_projection import (fused_projection, fused_projection_pallas,
                               fused_projection_reference)
