"""HoistedLSTM/HoistedGRU: input-projection-hoisted full-sequence recurrent
layers (models/rnn.py) must be bit-compatible — parameter tree AND math —
with flax's ``nn.RNN(OptimizedLSTMCell/GRUCell)``, since they replaced those
stacks in the LSTM/Seq2Seq movements models and the LSTM/GRU classifiers
(reference ``modules/movements/lstm.py:6-81``, ``modules/classification/
lstm.py:9-95`` lower to cuDNN kernels that hoist the same way)."""
import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.models.rnn import HoistedGRU, HoistedLSTM

B, L, E, H = 3, 7, 11, 5


@pytest.fixture(scope="module")
def x():
    return jax.random.normal(jax.random.PRNGKey(0), (B, L, E))


@pytest.mark.parametrize("reverse", [False, True])
def test_hoisted_lstm_matches_flax_rnn(x, reverse):
    ref = nn.RNN(nn.OptimizedLSTMCell(H), return_carry=True,
                 reverse=reverse, keep_order=False)
    hoist = HoistedLSTM(H, reverse=reverse)
    p = hoist.init(jax.random.PRNGKey(1), x)
    carry_r, out_r = ref.apply({"params": {"cell": p["params"]}}, x)
    carry_h, out_h = hoist.apply(p, x)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_h))
    for a, b in zip(carry_r, carry_h):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("reverse", [False, True])
def test_hoisted_gru_matches_flax_rnn(x, reverse):
    ref = nn.RNN(nn.GRUCell(H), return_carry=True,
                 reverse=reverse, keep_order=False)
    hoist = HoistedGRU(H, reverse=reverse)
    p = hoist.init(jax.random.PRNGKey(1), x)
    carry_r, out_r = ref.apply({"params": {"cell": p["params"]}}, x)
    carry_h, out_h = hoist.apply(p, x)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_h))
    np.testing.assert_array_equal(np.asarray(carry_r), np.asarray(carry_h))


def test_hoisted_lstm_initial_carry_and_grads(x):
    ref = nn.RNN(nn.OptimizedLSTMCell(H), return_carry=True)
    hoist = HoistedLSTM(H)
    p = hoist.init(jax.random.PRNGKey(1), x)
    pref = {"params": {"cell": p["params"]}}
    c0 = (jax.random.normal(jax.random.PRNGKey(3), (B, H)),
          jax.random.normal(jax.random.PRNGKey(4), (B, H)))
    _, out_r = ref.apply(pref, x, initial_carry=c0)
    _, out_h = hoist.apply(p, x, initial_carry=c0)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_h))

    gref = jax.grad(lambda pp: ref.apply(pp, x)[1].sum())(pref)
    gh = jax.grad(lambda pp: hoist.apply(pp, x)[1].sum())(p)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-6),
        gref["params"]["cell"], gh["params"])


def test_hoisted_lstm_bf16_matches_flax_rnn(x):
    """Under --precision bf16 params and inputs reach the layer as bf16;
    the hoisted path must promote exactly like the flax cell (carry dtype
    stability is what keeps lax.scan happy under AMP)."""
    ref = nn.RNN(nn.OptimizedLSTMCell(H), return_carry=True)
    hoist = HoistedLSTM(H)
    p = hoist.init(jax.random.PRNGKey(1), x)
    p16 = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16), p)
    x16 = x.astype(jnp.bfloat16)
    carry_r, out_r = ref.apply({"params": {"cell": p16["params"]}}, x16)
    carry_h, out_h = hoist.apply(p16, x16)
    assert out_h.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out_r, np.float32), np.asarray(out_h, np.float32),
        atol=2e-2)
    for a, b in zip(carry_r, carry_h):
        assert b.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32), atol=2e-2)


def test_model_param_trees_unchanged():
    """The swapped-in hoisted layers must keep the flax-cell param names so
    old checkpoints and models/torch_import.py keep loading."""
    from pedestrians_video_2_carla_tpu.models.classification.recurrent \
        import GRU as ClsGRU
    from pedestrians_video_2_carla_tpu.models.movements.lstm import LSTM
    from pedestrians_video_2_carla_tpu.models.movements.seq2seq \
        import Seq2SeqEmbeddings

    m = LSTM()
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 26, 2)))
    assert {"OptimizedLSTMCell_0", "OptimizedLSTMCell_1"} <= \
        set(p["params"])
    assert set(p["params"]["OptimizedLSTMCell_0"]) == \
        {"hf", "hg", "hi", "ho", "if", "ig", "ii", "io"}

    m = Seq2SeqEmbeddings()
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 26, 2)))
    assert {"OptimizedLSTMCell_0", "OptimizedLSTMCell_1", "decoder"} <= \
        set(p["params"])

    m = ClsGRU(num_classes=2)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((2, 4, 26, 2)))
    assert {"GRUCell_0", "GRUCell_1"} <= set(p["params"])
    assert set(p["params"]["GRUCell_0"]) == \
        {"hn", "hr", "hz", "in", "ir", "iz"}


@pytest.mark.parametrize("reverse", [False, True])
def test_hoisted_lstm_pallas_kernel_matches_xla(x, reverse):
    """kernel="pallas" (fused graph_lstm_scan k=1, CPU interpret mode) must
    reproduce the XLA scan path: outputs, final carry, and gradients. The
    kernel reassociates the bias adds, so allclose rather than bit-equal."""
    xla = HoistedLSTM(H, reverse=reverse, kernel="xla")
    ker = HoistedLSTM(H, reverse=reverse, kernel="pallas")
    p = xla.init(jax.random.PRNGKey(1), x)
    carry_r, out_r = xla.apply(p, x)
    carry_k, out_k = ker.apply(p, x)
    np.testing.assert_allclose(np.asarray(out_k), np.asarray(out_r),
                               rtol=0, atol=1e-6)
    for a, b in zip(carry_r, carry_k):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=0, atol=1e-6)

    gr = jax.grad(lambda pp, xx: jnp.sum(jnp.sin(xla.apply(pp, xx)[1])),
                  argnums=(0, 1))(p, x)
    gk = jax.grad(lambda pp, xx: jnp.sum(jnp.sin(ker.apply(pp, xx)[1])),
                  argnums=(0, 1))(p, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5), gk, gr)


def test_hoisted_lstm_pallas_final_carry_grads(x):
    """Gradients THROUGH the final carry (both c and h legs) — exercises the
    kernel's with_c output and its dcs cotangent input."""
    xla = HoistedLSTM(H, kernel="xla")
    ker = HoistedLSTM(H, kernel="pallas")
    p = xla.init(jax.random.PRNGKey(1), x)

    def loss(m):
        def f(pp, xx):
            (c, h), _ = m.apply(pp, xx)
            return jnp.sum(jnp.sin(c)) + jnp.sum(jnp.cos(h))
        return f

    gr = jax.grad(loss(xla), argnums=(0, 1))(p, x)
    gk = jax.grad(loss(ker), argnums=(0, 1))(p, x)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-5), gk, gr)


def test_hoisted_lstm_pallas_falls_back_with_initial_carry(x):
    """An explicit initial carry routes to the XLA scan (the kernel only
    models the zeros init) — results must still be exact."""
    ker = HoistedLSTM(H, kernel="pallas")
    p = ker.init(jax.random.PRNGKey(1), x)
    c0 = (jax.random.normal(jax.random.PRNGKey(3), (B, H)),
          jax.random.normal(jax.random.PRNGKey(4), (B, H)))
    ref = nn.RNN(nn.OptimizedLSTMCell(H), return_carry=True)
    _, out_r = ref.apply({"params": {"cell": p["params"]}}, x,
                         initial_carry=c0)
    _, out_k = ker.apply(p, x, initial_carry=c0)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_k))
