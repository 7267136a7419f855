"""Hoisted recurrent layers: full-sequence LSTM/GRU with the input-side gate
projections lifted out of the sequential scan.

The reference's torch ``nn.LSTM``/``nn.GRU`` stacks (reference
``modules/movements/lstm.py:6-81``, ``modules/movements/seq2seq/seq2seq.py:
29-45``, ``modules/classification/lstm.py:9-95``) lower to cuDNN kernels that
pre-compute the input projection ``x @ W_ih`` for every timestep as one
batched GEMM. ``nn.RNN(nn.OptimizedLSTMCell(H))`` re-does that matmul inside
every scan step, putting a (B, E) x (E, 4H) contraction on the sequential
dependency chain. On TPU the fix is the same as cuDNN's: hoist the input
projection to a single (B·L, E) x (E, 4H) MXU matmul before the scan and keep
only the (B, H) x (H, 4H) hidden matmul + gating in the ``lax.scan`` body —
for wide inputs this shrinks the per-step chain work ~(E+H)/H-fold (27x for
Seq2SeqEmbeddings layer 0: E=1664, H=64).

Measured effect (real TPU, r2): the full Seq2SeqEmbeddings train step is at
*parity* with the ``nn.RNN`` formulation (interleaved in-process A/B, best-of
1.37 vs 1.44 ms at B=256 L=16 — ~5% ahead, within tunnel noise): at these
shapes the step is dominated by the sequential teacher-forcing decoder, and
XLA already keeps the encoder's per-step input GEMM off the critical path by
overlapping scan iterations. Kept because it is structurally the right
lowering (the win grows with E/H and clip length), is exactly
checkpoint-compatible, and never loses.

Math and parameter trees are bit-compatible with the flax cells
(``OptimizedLSTMCell``: params ``i{i,f,g,o}`` kernel-only + ``h{i,f,g,o}``
kernel+bias, gate order i,f,g,o; ``GRUCell``: ``i{r,z,n}`` kernel-only +
``h{r,z,n}`` kernel+bias, candidate gate ``tanh(x@Wn + r * (h@Whn + bn))``),
so instances named ``OptimizedLSTMCell_{n}`` / ``GRUCell_{n}`` load existing
checkpoints and torch imports unchanged (``models/torch_import.py``).
Equivalence vs the flax cells is tested in ``tests/models/test_rnn.py``.
"""
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from flax.linen import initializers
from flax.linen.dtypes import promote_dtype

Carry = Tuple[jnp.ndarray, jnp.ndarray]


def _dense_lstm_kernel_scan(xg, k_h, B):
    """Run the LSTM recurrence as ONE fused Pallas kernel
    (``ops/pallas/fused_graph_gru.graph_lstm_scan`` with k=1 — the graph
    contraction degenerates away and the slab rows are just the batch).

    :param xg: (L, B, 4H) gate pre-activations with ALL biases folded in,
        gate order i|f|g|o (the kernel's i|f|c|o).
    :param k_h: (H, 4H) hidden-side weights.
    :return: ``((c_final, h_final), hs (B, L, H))`` matching the XLA scan.
    """
    from ..ops.pallas.fused_graph_gru import (graph_lstm_scan,
                                              pick_block_groups)
    L, rows0, _ = xg.shape
    pad = (-rows0) % 8
    if pad:
        xg = jnp.concatenate(
            [xg, jnp.zeros((L, pad, xg.shape[2]), xg.dtype)], axis=1)
    # R=8 keeps row-blocks sublane-aligned; target 128 groups = 1024-row
    # blocks (whole batch in one grid block up to B=1024)
    ys, cs = graph_lstm_scan(
        xg, jnp.zeros((0, 8, 8), xg.dtype), k_h, 1, 8,
        pick_block_groups((rows0 + pad) // 8, target=128), True)
    return (cs[-1, :B], ys[-1, :B]), jnp.swapaxes(ys[:, :B], 0, 1)


class _GateParams(nn.Module):
    """Parameter-only child module producing the ``<name>/kernel`` (+
    ``<name>/bias``) subtree of one flax-cell gate."""
    fan_in: int
    features: int
    use_bias: bool
    kernel_init: Any
    bias_init: Any

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", self.kernel_init,
                            (self.fan_in, self.features))
        bias = self.param("bias", self.bias_init, (self.features,)) \
            if self.use_bias else None
        return kernel, bias


class HoistedLSTM(nn.Module):
    """One LSTM layer over a whole ``(B, L, E)`` sequence, input projection
    hoisted. Returns ``(final_carry, outputs)`` with carry ``(c, h)`` like
    ``nn.RNN(cell, return_carry=True)``. With ``reverse=True`` the sequence
    is processed back-to-front and outputs stay in processing order,
    matching ``nn.RNN(reverse=True, keep_order=False)``."""
    features: int
    reverse: bool = False
    unroll: int = 1
    kernel_init: Any = initializers.lecun_normal()
    recurrent_kernel_init: Any = initializers.orthogonal()
    bias_init: Any = initializers.zeros_init()
    #: "auto" | "pallas" | "xla": "pallas" runs the scan as ONE fused TPU
    #: kernel (``ops/pallas/fused_graph_gru.graph_lstm_scan`` with k=1 —
    #: a plain dense LSTM: VMEM-resident (h, c) carry, weights loaded once).
    #: Applies only with a zeros initial carry (an explicit
    #: ``initial_carry`` falls back to the XLA scan). Kernel adds are
    #: reassociated vs the flax cell (bit-identical is only guaranteed on
    #: the XLA path). Measured on the B256/L16/H64 2-layer LSTM classifier
    #: train step (tools/graph_gru_kernel_probe.py LSTM): the kernel
    #: LOSES both dtypes — fp32 0.87x originally, and the r5 re-probe
    #: (after the GNN family's slab-resident restructure, which this
    #: dense k=1 path shares) measured 0.92x/0.91x fp32/bf16: the XLA
    #: scan at these small shapes is already latency-lean. The pre-r5
    #: bf16 1.07x was measured on the old relayout-heavy call path, so
    #: "auto" now keeps the XLA scan everywhere; "pallas" remains the
    #: explicit override.
    kernel: str = "auto"

    def _use_kernel(self, initial_carry, dtype) -> bool:
        if self.kernel == "xla" or initial_carry is not None:
            return False
        if self.kernel == "pallas":
            return True
        return False  # "auto": XLA measured faster at both precisions

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 initial_carry: Optional[Carry] = None):
        B, L, E = x.shape
        H = self.features
        ks_i, ks_h, bs_h = [], [], []
        for comp in "ifgo":
            k, _ = _GateParams(E, H, False, self.kernel_init,
                               self.bias_init, name=f"i{comp}")()
            ks_i.append(k)
        for comp in "ifgo":
            k, b = _GateParams(H, H, True, self.recurrent_kernel_init,
                               self.bias_init, name=f"h{comp}")()
            ks_h.append(k)
            bs_h.append(b)
        k_i = jnp.concatenate(ks_i, axis=-1)               # (E, 4H)
        k_h = jnp.concatenate(ks_h, axis=-1)               # (H, 4H)
        b_h = jnp.concatenate(bs_h, axis=-1)               # (4H,)
        (x, k_i, k_h, b_h) = promote_dtype(x, k_i, k_h, b_h, dtype=None)
        dt = x.dtype
        use_kernel = self._use_kernel(initial_carry, dt)
        if initial_carry is None:
            initial_carry = (jnp.zeros((B, H), dt), jnp.zeros((B, H), dt))
        else:
            initial_carry = jax.tree_util.tree_map(
                lambda a: a.astype(dt), initial_carry)

        # the hoisted input projection: ONE large MXU matmul for all frames
        gx = (x.reshape(B * L, E) @ k_i).reshape(B, L, 4 * H)
        gx = jnp.swapaxes(gx, 0, 1)                        # (L, B, 4H)
        if self.reverse:
            gx = jnp.flip(gx, axis=0)

        if use_kernel:
            return _dense_lstm_kernel_scan(gx + b_h, k_h, B)

        def step(carry, gx_t):
            c, h = carry
            # (h @ k_h + b_h) + gx_t matches the flax cell's
            # dense_h + dense_i summation order exactly
            y = (h @ k_h + b_h) + gx_t
            gi, gf, gg, go = jnp.split(y, 4, axis=-1)
            i, f = nn.sigmoid(gi), nn.sigmoid(gf)
            g, o = nn.tanh(gg), nn.sigmoid(go)
            new_c = f * c + i * g
            new_h = o * nn.tanh(new_c)
            return (new_c, new_h), new_h

        carry, hs = jax.lax.scan(step, initial_carry, gx,
                                 unroll=self.unroll)
        return carry, jnp.swapaxes(hs, 0, 1)               # (B, L, H)


class HoistedGRU(nn.Module):
    """One GRU layer over a whole ``(B, L, E)`` sequence, input projection
    hoisted; parameter-tree- and math-compatible with ``nn.GRUCell``:
    input denses ``i{r,z,n}`` carry kernel+bias, hidden denses ``h{r,z}``
    are bias-free and the candidate ``hn`` has a bias —
    ``n = tanh(dense_i(x) + r * dense_h_n(h))``."""
    features: int
    reverse: bool = False
    unroll: int = 1
    kernel_init: Any = initializers.lecun_normal()
    recurrent_kernel_init: Any = initializers.orthogonal()
    bias_init: Any = initializers.zeros_init()
    #: reserved for API symmetry with HoistedLSTM — the GRU candidate gate's
    #: ``r * (h @ W + b)`` structure has no fused kernel yet, so every value
    #: runs the XLA scan
    kernel: str = "auto"

    @nn.compact
    def __call__(self, x: jnp.ndarray,
                 initial_carry: Optional[jnp.ndarray] = None):
        B, L, E = x.shape
        H = self.features
        ks_i, bs_i, ks_h = [], [], []
        for comp in "rzn":
            k, b = _GateParams(E, H, True, self.kernel_init,
                               self.bias_init, name=f"i{comp}")()
            ks_i.append(k)
            bs_i.append(b)
        for comp in "rzn":
            k, b = _GateParams(H, H, comp == "n",
                               self.recurrent_kernel_init, self.bias_init,
                               name=f"h{comp}")()
            ks_h.append(k)
            if b is not None:
                b_n = b
        k_i = jnp.concatenate(ks_i, axis=-1)               # (E, 3H)
        b_i = jnp.concatenate(bs_i, axis=-1)               # (3H,)
        k_h = jnp.concatenate(ks_h, axis=-1)               # (H, 3H)
        (x, k_i, b_i, k_h, b_n) = promote_dtype(
            x, k_i, b_i, k_h, b_n, dtype=None)
        dt = x.dtype
        if initial_carry is None:
            initial_carry = jnp.zeros((B, H), dt)
        else:
            initial_carry = initial_carry.astype(dt)

        gx = (x.reshape(B * L, E) @ k_i + b_i).reshape(B, L, 3 * H)
        gx = jnp.swapaxes(gx, 0, 1)                        # (L, B, 3H)
        if self.reverse:
            gx = jnp.flip(gx, axis=0)

        def step(h, gx_t):
            xr, xz, xn = jnp.split(gx_t, 3, axis=-1)
            yh = h @ k_h
            hr, hz, hn = jnp.split(yh, 3, axis=-1)
            r = nn.sigmoid(xr + hr)
            z = nn.sigmoid(xz + hz)
            n = nn.tanh(xn + r * (hn + b_n))
            new_h = (1.0 - z) * n + z * h
            return new_h, new_h

        carry, hs = jax.lax.scan(step, initial_carry, gx,
                                 unroll=self.unroll)
        return carry, jnp.swapaxes(hs, 0, 1)               # (B, L, H)
