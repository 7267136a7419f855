"""Analytic FLOP counts for the hand-written Pallas kernels.

XLA's ``compiled.cost_analysis()`` sees a Pallas kernel as an opaque custom
call with 0 FLOPs, so any MFU computed from the cost model alone under-counts
the fused-kernel paths (the r2 temporal-kernel PoseFormer step reported
0.02% MFU). The formulas here reconstruct the matmul FLOPs the kernels
actually issue; ``tests/ops/test_kernel_flops.py`` pins them against XLA's
own cost analysis of the equivalent flax (non-Pallas) blocks so an error in
the formula cannot silently inflate the headline MFU.

FLOP convention: 1 multiply-accumulate = 2 FLOPs (matches XLA's cost model).
"""


def transformer_block_matmul_flops(n_tokens: int, dim: int,
                                   mlp_ratio: float = 2.0,
                                   seq_len: int | None = None) -> int:
    """Matmul FLOPs of ONE pre-norm transformer encoder block forward pass.

    Counts the dense projections: qkv 3*D^2 MACs, attn out D^2, fc1 r*D^2,
    fc2 r*D^2 per token -> (4 + 2r) * D^2 MACs = (8 + 4r) * D^2 FLOPs per
    token; plus the attention score (QK^T) and value (AV) matmuls —
    2 * seq_len * D MACs = 4 * seq_len * D FLOPs per token — when
    ``seq_len`` is given. The fused spatial/temporal kernels run exactly
    these matmuls (ops/pallas/fused_spatial_transformer.py,
    fused_temporal_transformer.py).
    """
    flops_per_token = (8 + 4 * mlp_ratio) * dim * dim
    if seq_len is not None:
        flops_per_token += 4 * seq_len * dim
    return int(n_tokens * flops_per_token)


def poseformer_kernel_train_flops(batch: int, clip_length: int = 16,
                                  receptive_frames: int = 9, joints: int = 26,
                                  embed_dim: int = 32, depth: int = 4,
                                  mlp_ratio: float = 2.0,
                                  include_attention: bool = False) -> int:
    """Analytic matmul FLOPs of the fused spatial + temporal Pallas kernels
    in one PoseFormer TRAIN step (fwd + dx + dW ~ 3x the forward).

    The spatial stage runs ``depth`` blocks over ``batch * L`` windows of
    ``joints`` tokens at ``embed_dim``; the temporal stage runs ``depth``
    blocks over ``batch * (L - rf + 1)`` windows of ``receptive_frames``
    tokens at ``joints * embed_dim`` (models/movements/pose_former.py).
    Attention score/value FLOPs are negligible at 26/9 tokens and excluded
    by default to stay a LOWER bound (an MFU computed from this can only
    under-report).
    """
    seq_s = joints if include_attention else None
    seq_t = receptive_frames if include_attention else None
    fwd = depth * (
        transformer_block_matmul_flops(
            batch * clip_length * joints, embed_dim, mlp_ratio, seq_s)
        + transformer_block_matmul_flops(
            batch * (clip_length - receptive_frames + 1) * receptive_frames,
            joints * embed_dim, mlp_ratio, seq_t))
    return int(3 * fwd)
