"""Multi-chip scaling: device mesh construction and sharding rules.

The reference's only parallelism is Lightning DDP over NCCL (SURVEY.md §2.13).
Here the equivalent is a ``jax.sharding.Mesh`` with the batch sharded over the
``data`` axis: gradients/metrics are all-reduced by XLA-inserted collectives
over ICI. The mesh also reserves a ``model`` axis so tensor-parallel shardings
can be layered onto large models without restructuring the trainer.
"""
from .mesh import MeshConfig, make_mesh, shard_batch, replicate

__all__ = ["MeshConfig", "make_mesh", "shard_batch", "replicate"]
