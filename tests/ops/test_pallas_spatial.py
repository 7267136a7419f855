"""Fused spatial-transformer Pallas kernel vs the flax block stack.

The kernel (``ops/pallas/fused_spatial_transformer.py``) must be a drop-in
for PoseFormer's spatial stage (reference third-party ``pose_former.py:
17-138``): same math, same param tree, hand-written backward matching
autodiff. CPU runs the kernel in interpret mode."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS
from pedestrians_video_2_carla_tpu.models.movements.pose_former import (
    _Block, _LayerNorm)
from pedestrians_video_2_carla_tpu.ops.pallas.fused_spatial_transformer import (
    fused_spatial_stack, spatial_stack_reference)

J, E, H, DEPTH = 26, 32, 8, 2


class _FlaxStack(nn.Module):
    @nn.compact
    def __call__(self, x):
        for i in range(DEPTH):
            x = _Block(E, H, 2.0, 0.0, 0.0, name=f"b{i}")(x, False)
        return _LayerNorm(name="norm")(x)


def _weights_from(params):
    p = params["params"]

    def stack(f):
        return jnp.stack([f(p[f"b{i}"]) for i in range(DEPTH)])

    return (
        stack(lambda b: b["LayerNorm_0"]["scale"]),
        stack(lambda b: b["LayerNorm_0"]["bias"]),
        stack(lambda b: b["_Attention_0"]["qkv"]["kernel"]),
        stack(lambda b: b["_Attention_0"]["qkv"]["bias"]),
        stack(lambda b: b["_Attention_0"]["proj"]["kernel"]),
        stack(lambda b: b["_Attention_0"]["proj"]["bias"]),
        stack(lambda b: b["LayerNorm_1"]["scale"]),
        stack(lambda b: b["LayerNorm_1"]["bias"]),
        stack(lambda b: b["_Mlp_0"]["Dense_0"]["kernel"]),
        stack(lambda b: b["_Mlp_0"]["Dense_0"]["bias"]),
        stack(lambda b: b["_Mlp_0"]["Dense_1"]["kernel"]),
        stack(lambda b: b["_Mlp_0"]["Dense_1"]["bias"]),
        p["norm"]["scale"][None], p["norm"]["bias"][None],
    )


@pytest.fixture(scope="module")
def stack_setup():
    x = jax.random.normal(jax.random.PRNGKey(0), (16, J, E), jnp.float32)
    m = _FlaxStack()
    params = m.init(jax.random.PRNGKey(1), x)
    return x, m, params, _weights_from(params)


def test_fused_forward_matches_flax_stack(stack_setup):
    x, m, params, weights = stack_setup
    ref = m.apply(params, x)
    out = fused_spatial_stack(x, weights, H)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)
    # and the pure-XLA mirror of the kernel math agrees too
    mirror = spatial_stack_reference(x, weights, H)
    np.testing.assert_allclose(np.asarray(mirror), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_fused_forward_pads_arbitrary_batch(stack_setup):
    x, m, params, weights = stack_setup
    x_odd = x[:11]  # not a multiple of the frame block
    ref = m.apply(params, x_odd)
    out = fused_spatial_stack(x_odd, weights, H)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


def test_fused_backward_matches_autodiff(stack_setup):
    x, m, params, weights = stack_setup

    gx_k, gw_k = jax.grad(
        lambda x, w: jnp.sum(jnp.sin(fused_spatial_stack(x, w, H))),
        argnums=(0, 1))(x, weights)
    gx_f, gp_f = jax.grad(
        lambda x, p: jnp.sum(jnp.sin(m.apply(p, x))),
        argnums=(0, 1))(x, params)
    gw_f = _weights_from(gp_f)

    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_f),
                               rtol=0, atol=1e-4)
    for a, b in zip(gw_k, gw_f):
        scale = float(np.max(np.abs(np.asarray(b)))) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=1e-4)


def test_fused_bf16_close_to_fp32(stack_setup):
    x, m, params, weights = stack_setup
    ref = np.asarray(fused_spatial_stack(x, weights, H), np.float32)
    xb = x.astype(jnp.bfloat16)
    wb = jax.tree_util.tree_map(lambda w: w.astype(jnp.bfloat16), weights)
    out = np.asarray(fused_spatial_stack(xb, wb, H), np.float32)
    assert np.isfinite(out).all()
    denom = np.max(np.abs(ref)) + 1e-6
    assert np.max(np.abs(out - ref)) / denom < 5e-2


def test_poseformer_pallas_spatial_is_drop_in():
    """Same param tree, same init draws, same outputs and (significant)
    gradients as the XLA path — checkpoints are interchangeable."""
    kw = dict(clip_length=9, receptive_frames=9, depth=2, num_heads=8)
    m_xla = MOVEMENTS_MODELS["PoseFormer"](**kw)
    m_pal = MOVEMENTS_MODELS["PoseFormer"](spatial_kernel="pallas", **kw)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 9, 26, 2), jnp.float32)
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
            # its TRUE gradient is exactly 0 (the bias feeds head_norm, a
            # LayerNorm, which is shift-invariant — x64 finite differences
            # confirm ~1e-11), so fp32 values are pure cancellation noise
            # on BOTH paths and cannot be compared
            continue
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.max(np.abs(a)), 1e-3)  # skip noise-level leaves
        np.testing.assert_allclose(
            b / scale, a / scale, rtol=0, atol=1e-4,
            err_msg=key)


def test_poseformer_pallas_rejects_training_dropout():
    m = MOVEMENTS_MODELS["PoseFormer"](
        clip_length=9, receptive_frames=9, depth=1, drop_rate=0.1,
        spatial_kernel="pallas")
    x = jnp.zeros((2, 9, 26, 2), jnp.float32)
    with pytest.raises(ValueError, match="dropout"):
        m.init(jax.random.PRNGKey(0), x, training=True)
