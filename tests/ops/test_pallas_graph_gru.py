"""Fused graph-GRU Pallas kernel vs the XLA ``lax.scan`` path.

The kernel (``ops/pallas/fused_graph_gru.py``) must be a drop-in for the
GRU-cell classification GNN family — GConvGRU / DCRNN / TGCN /
SpatialTemporalGNN (reference ``modules/classification/gnn/rnn.py``,
``spatial_temporal_gnn.py`` via torch_geometric_temporal cells): identical
param tree, same math, hand-written backward matching autodiff. CPU runs the
kernel in interpret mode, where fp32 dots are exact — parity against the
scan path is tight."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.models.classification import \
    CLASSIFICATION_MODELS

B, L, J, H = 6, 5, 26, 16  # B=6 exercises the pad-to-BBR-multiple path

CASES = [
    ("GConvGRU", dict(hidden_size=H)),             # Chebyshev k=2, laplacian
    ("DCRNN", dict(hidden_size=H)),                # k=2, normalized adjacency
    ("TGCN", dict(hidden_size=H)),                 # k=1 (no a_ops input)
    ("SpatialTemporalGNN", dict()),                # k=3, tiny H=3, 1 layer
    ("GConvLSTM", dict(hidden_size=H)),            # LSTM cell, (h, c) carry
]


def _pair(name, kwargs):
    cls = CLASSIFICATION_MODELS[name]
    xla = cls(graph_kernel="xla", **kwargs)
    pallas = cls(graph_kernel="pallas", **kwargs)
    feats = xla.input_features
    x = jax.random.normal(jax.random.PRNGKey(0), (B, L, J, feats))
    params = xla.init(jax.random.PRNGKey(1), x)
    return xla, pallas, params, x


@pytest.mark.parametrize("name,kwargs", CASES)
def test_forward_matches_xla_scan(name, kwargs):
    xla, pallas, params, x = _pair(name, kwargs)
    ref = xla.apply(params, x)
    out = pallas.apply(params, x)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0, atol=1e-5)


@pytest.mark.parametrize("name,kwargs", CASES)
def test_param_trees_identical(name, kwargs):
    xla, pallas, params, x = _pair(name, kwargs)
    p2 = pallas.init(jax.random.PRNGKey(1), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)), params, p2)


@pytest.mark.parametrize("name,kwargs", CASES[:1] + CASES[2:3] + CASES[4:])
def test_backward_matches_autodiff(name, kwargs):
    xla, pallas, params, x = _pair(name, kwargs)

    def loss(m):
        return lambda p, xx: jnp.sum(jnp.sin(m.apply(p, xx)))

    gp_r, gx_r = jax.grad(loss(xla), argnums=(0, 1))(params, x)
    gp_k, gx_k = jax.grad(loss(pallas), argnums=(0, 1))(params, x)

    np.testing.assert_allclose(np.asarray(gx_k), np.asarray(gx_r),
                               rtol=0, atol=1e-4)

    def close(a, b):
        scale = float(np.max(np.abs(np.asarray(b)))) + 1e-6
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=0, atol=1e-4)

    jax.tree_util.tree_map(close, gp_k, gp_r)


@pytest.mark.parametrize("name,kwargs,entry", [
    ("GConvGRU", dict(hidden_size=H), "graph_gru_scan"),
    ("SpatialTemporalGNN", dict(), "graph_gru_scan"),  # k=3 via _layer_pallas
    ("GConvLSTM", dict(hidden_size=H), "graph_lstm_scan"),
])
def test_pallas_config_takes_kernel_path(name, kwargs, entry, monkeypatch):
    """graph_kernel='pallas' must actually dispatch to the fused kernel —
    a silent XLA fallback makes every parity test above vacuous (advisor
    r4: SpatialTemporalGNN's overridden __call__ skipped the dispatch, so
    the k=3/tiny-H kernel path had no entry point and no coverage)."""
    from pedestrians_video_2_carla_tpu.ops.pallas import fused_graph_gru as fg
    calls = []
    orig = getattr(fg, entry)

    def probe(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(fg, entry, probe)
    _, pallas, params, x = _pair(name, kwargs)
    pallas.apply(params, x)
    assert calls, f"{name} with graph_kernel='pallas' never hit fg.{entry}"


def test_bf16_close_to_fp32():
    xla, pallas, params, x = _pair("GConvGRU", dict(hidden_size=H))
    ref = np.asarray(pallas.apply(params, x), np.float32)
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    out = pallas.apply(p16, x.astype(jnp.bfloat16))
    assert out.dtype == jnp.bfloat16
    out = np.asarray(out, np.float32)
    assert np.isfinite(out).all()
    denom = np.max(np.abs(ref)) + 1e-6
    assert np.max(np.abs(out - ref)) / denom < 5e-2
