"""Fused temporal-transformer Pallas kernel vs the flax block.

The kernel (``ops/pallas/fused_temporal_transformer.py``) must be a drop-in
for PoseFormer's temporal stage (reference third-party ``pose_former.py:
17-138``): same math, same param tree, hand-written backward matching
autodiff. CPU runs the kernel in interpret mode."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS
from pedestrians_video_2_carla_tpu.models.movements.pose_former import _Block
from pedestrians_video_2_carla_tpu.ops.pallas.fused_temporal_transformer import (
    fused_temporal_block, temporal_block_reference)

T, D, H = 9, 64, 8


def _weights_from(params):
    p = params["params"]
    return (
        p["LayerNorm_0"]["scale"], p["LayerNorm_0"]["bias"],
        p["_Attention_0"]["qkv"]["kernel"], p["_Attention_0"]["qkv"]["bias"],
        p["_Attention_0"]["proj"]["kernel"],
        p["_Attention_0"]["proj"]["bias"],
        p["LayerNorm_1"]["scale"], p["LayerNorm_1"]["bias"],
        p["_Mlp_0"]["Dense_0"]["kernel"], p["_Mlp_0"]["Dense_0"]["bias"],
        p["_Mlp_0"]["Dense_1"]["kernel"], p["_Mlp_0"]["Dense_1"]["bias"],
    )


@pytest.fixture(scope="module")
def block_setup():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, T, D), jnp.float32)
    m = _Block(D, H, 2.0, 0.0, 0.0)
    params = m.init(jax.random.PRNGKey(1), x, False)
    return x, m, params, _weights_from(params)


def test_fused_forward_matches_flax_block(block_setup):
    x, m, params, weights = block_setup
    ref = m.apply(params, x, False)
    out = fused_temporal_block(x, weights, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)
    mirror = temporal_block_reference(x, weights, H)
    np.testing.assert_allclose(np.asarray(mirror), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_fused_forward_pads_arbitrary_batch(block_setup):
    x, m, params, weights = block_setup
    x_odd = x[:11]  # not a multiple of the lane block
    ref = m.apply(params, x_odd, False)
    out = fused_temporal_block(x_odd, weights, H)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_fused_backward_matches_autodiff(block_setup):
    x, m, params, weights = block_setup

    gx_k, gw_k = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(fused_temporal_block(x, w, H))),
        argnums=(0, 1))(x, weights)
    gx_f, gp_f = jax.grad(
        lambda x, p: jnp.sum(jnp.sin(m.apply(p, x, False))),
        argnums=(0, 1))(x, params)
    gw_f = _weights_from(gp_f)

    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_f),
                               rtol=0, atol=1e-4)
    for a, b in zip(gw_k, gw_f):
        scale = float(np.max(np.abs(np.asarray(b)))) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=1e-4)


def test_fused_bf16_close_to_fp32(block_setup):
    x, m, params, weights = block_setup
    ref = np.asarray(fused_temporal_block(x, weights, H), np.float32)
    xb = x.astype(jnp.bfloat16)
    wb = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), weights)
    out = np.asarray(fused_temporal_block(xb, wb, H), np.float32)
    assert np.isfinite(out).all()
    denom = np.max(np.abs(ref)) + 1e-6
    assert np.max(np.abs(out - ref)) / denom < 5e-2


def test_poseformer_pallas_temporal_is_drop_in():
    """Same param tree, same init draws, same outputs and (significant)
    gradients as the XLA path — checkpoints are interchangeable."""
    kw = dict(clip_length=11, receptive_frames=9, depth=2, num_heads=8)
    m_xla = MOVEMENTS_MODELS["PoseFormer"](**kw)
    m_pal = MOVEMENTS_MODELS["PoseFormer"](temporal_kernel="pallas", **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 11, 26, 2), jnp.float32)
    p_xla = m_xla.init(jax.random.PRNGKey(1), x, training=False)
    p_pal = m_pal.init(jax.random.PRNGKey(1), x, training=False)
    assert jax.tree_util.tree_structure(p_xla) == \
        jax.tree_util.tree_structure(p_pal)
    assert all(np.array_equal(a, b) for a, b in zip(
        jax.tree_util.tree_leaves(p_xla), jax.tree_util.tree_leaves(p_pal)))

    o_xla = m_xla.apply(p_xla, x, training=False)
    o_pal = m_pal.apply(p_xla, x, training=False)
    np.testing.assert_allclose(np.asarray(o_pal), np.asarray(o_xla),
                               rtol=0, atol=1e-5)

    def loss(m):
        return lambda p: jnp.sum(m.apply(p, x, training=False) ** 2)

    g_xla = jax.grad(loss(m_xla))(p_xla)
    g_pal = jax.grad(loss(m_pal))(p_xla)
    for (path, a), b in zip(
            jax.tree_util.tree_flatten_with_path(g_xla)[0],
            jax.tree_util.tree_leaves(g_pal)):
        key = jax.tree_util.keystr(path)
        if "weighted_mean_bias" in key:
            # true gradient is exactly 0 (feeds a shift-invariant LayerNorm);
            # fp32 values are cancellation noise on both paths
            continue
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.max(np.abs(a)), 1e-3)  # skip noise-level leaves
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=0, atol=1e-4,
            err_msg=key)


def test_poseformer_pallas_temporal_rejects_training_dropout():
    m = MOVEMENTS_MODELS["PoseFormer"](
        clip_length=9, receptive_frames=9, depth=1, drop_rate=0.1,
        temporal_kernel="pallas")
    x = jnp.zeros((2, 9, 26, 2), jnp.float32)
    with pytest.raises(ValueError, match="dropout"):
        m.init(jax.random.PRNGKey(0), x, training=True)


def test_fused_stack_matches_per_block(block_setup):
    """fused_temporal_stack (slab-resident, one layout round-trip) must be
    numerically identical to composing fused_temporal_block per block —
    forward AND gradients (r3: the stack entry point skips per-block
    transposes)."""
    from pedestrians_video_2_carla_tpu.ops.pallas.fused_temporal_transformer \
        import fused_temporal_stack
    x, m, params, weights = block_setup
    k = jax.random.PRNGKey(3)
    w2 = jax.tree_util.tree_map(
        lambda w: w + 0.01 * jax.random.normal(k, w.shape, w.dtype), weights)
    wl = [weights, w2]

    def per_block(x, wl):
        for wp in wl:
            x = fused_temporal_block(x, wp, H)
        return x

    ref = per_block(x, wl)
    out = fused_temporal_stack(x, wl, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)

    def loss_stack(x, wl):
        return jnp.sum(fused_temporal_stack(x, wl, H) ** 2)

    def loss_blocks(x, wl):
        return jnp.sum(per_block(x, wl) ** 2)

    gx_s, gw_s = jax.grad(loss_stack, argnums=(0, 1))(x, wl)
    gx_b, gw_b = jax.grad(loss_blocks, argnums=(0, 1))(x, wl)
    np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_b),
                               rtol=0, atol=3e-4)
    for a, b in zip(jax.tree_util.tree_leaves(gw_s),
                    jax.tree_util.tree_leaves(gw_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=0, atol=3e-4)


def test_fused_block_grad_covers_tail_windows(block_setup):
    """N not a multiple of any block width: gradients for the tail windows
    must be written (r3 review finding: the backward grid truncated when the
    slab was padded for a different width, leaving NaN/garbage rows)."""
    _, m, params, weights = block_setup
    N = 136  # pads to 136 on CPU; attn-half width 128 would drop rows 128+
    x = jax.random.normal(jax.random.PRNGKey(9), (N, T, D), jnp.float32)

    def loss(x, w):
        return jnp.sum(fused_temporal_block(x, w, H) ** 2)

    gx, gw = jax.grad(loss, argnums=(0, 1))(x, weights)
    assert np.isfinite(np.asarray(gx)).all()

    def ref_loss(x, _):
        return jnp.sum(m.apply(params, x, False) ** 2)

    gx_ref = jax.grad(ref_loss)(x, weights)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=0, atol=5e-4)
