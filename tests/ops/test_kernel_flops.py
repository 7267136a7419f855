"""Pin the analytic Pallas-kernel FLOPs formulas (ops/pallas/flops.py)
against XLA's own cost model of the equivalent flax blocks.

The PoseFormer MFU headline in bench.py depends on these formulas (XLA sees
a Pallas custom call as 0 FLOPs), so an error here would silently inflate or
deflate the benchmark (VERDICT r2, weak #5). The flax ``_Block`` runs exactly
the matmuls the fused kernels issue, so XLA's cost analysis of it is an
independent hand-count: the formula must land just below it (the cost model
additionally counts layernorm/softmax/gelu elementwise FLOPs the formula
deliberately excludes)."""
import jax
import jax.numpy as jnp
import pytest

from pedestrians_video_2_carla_tpu.models.movements.pose_former import _Block
from pedestrians_video_2_carla_tpu.ops.pallas.flops import (
    poseformer_kernel_train_flops, transformer_block_matmul_flops)


def _measured_block_flops(batch, tokens, dim, mlp_ratio=2.0, num_heads=8):
    block = _Block(dim=dim, num_heads=num_heads, mlp_ratio=mlp_ratio,
                   drop=0.0, attn_drop=0.0)
    x = jnp.zeros((batch, tokens, dim), jnp.float32)
    params = block.init(jax.random.PRNGKey(0), x)
    compiled = jax.jit(lambda p, x: block.apply(p, x)) \
        .lower(params, x).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = ca.get("flops")
    if not flops:
        pytest.skip("XLA cost model reports no flops on this backend")
    return float(flops)


@pytest.mark.parametrize("batch,tokens,dim,lower", [
    # spatial stage shape (J tokens, emb 32): at D=32 the layernorm/softmax/
    # gelu elementwise FLOPs the formula excludes are ~23% of XLA's count
    (4, 26, 32, 0.70),
    # temporal stage shape (rf tokens, J*emb): matmuls dominate -> tight
    (2, 9, 832, 0.90),
])
def test_block_formula_matches_xla_cost_model(batch, tokens, dim, lower):
    measured = _measured_block_flops(batch, tokens, dim)
    formula = transformer_block_matmul_flops(
        batch * tokens, dim, mlp_ratio=2.0, seq_len=tokens)
    # the formula counts every matmul but none of the elementwise work, so
    # it must be a LOWER bound on XLA's full count, close enough that a
    # factor-of-2 / missing-matmul error cannot hide in the gap
    assert formula <= measured * 1.001, \
        f"formula {formula} exceeds XLA count {measured}"
    assert formula >= lower * measured, \
        f"formula {formula} vs XLA count {measured}: matmuls missing"


def test_poseformer_train_formula_composition():
    """The train-step formula must equal 3x (fwd+bwd convention) the sum of
    depth x (spatial + temporal) block forwards at the bench shapes."""
    B, L, rf, J, emb, depth = 2, 16, 9, 26, 32, 4
    per_fwd = depth * (
        transformer_block_matmul_flops(B * L * J, emb, 2.0)
        + transformer_block_matmul_flops(B * (L - rf + 1) * rf, J * emb, 2.0))
    assert poseformer_kernel_train_flops(
        B, clip_length=L, receptive_frames=rf, joints=J, embed_dim=emb,
        depth=depth) == 3 * per_fwd


def test_poseformer_train_formula_vs_stacked_stages():
    """End-to-end pin at a tiny case (B=2): the full fwd formula (train/3)
    vs XLA's cost analysis of the stacked spatial+temporal flax stages."""
    B, L, rf, J, emb, depth = 2, 16, 9, 26, 32, 4
    measured = (
        depth * _measured_block_flops(B * L, J, emb)
        + depth * _measured_block_flops(B * (L - rf + 1), rf, J * emb))
    formula_fwd = poseformer_kernel_train_flops(
        B, clip_length=L, receptive_frames=rf, joints=J, embed_dim=emb,
        depth=depth, include_attention=True) / 3
    assert formula_fwd <= measured * 1.001
    assert formula_fwd >= 0.80 * measured
