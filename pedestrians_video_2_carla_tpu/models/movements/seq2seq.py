"""Seq2Seq movements family (reference ``modules/movements/seq2seq/``):
LSTM encoder -> autoregressive LSTM decoder with teacher forcing
(Sutskever'14), plus the Embeddings / FlatEmbeddings / ResidualA/B/C variants.

TPU-first: the decoder's frame-by-frame Python loop (reference
``seq2seq.py:263-268``) becomes an ``nn.scan`` over the clip with the
(hidden, cell, previous-output) carry; teacher-forcing masks are drawn from
the PRNG up front and folded into the scan inputs (reference
``seq2seq.py:323-363`` ``_teacher_forcing``)."""
from enum import Enum
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...flows.output_types import MovementsModelOutputType
from ...ops.rotations import matrix_to_rotation_6d, rotation_6d_to_matrix
from .common import MovementsModel, TorchDense, torch_hoisted_lstm,\
    torch_lstm_cell, torch_uniform_init


class TeacherMode(Enum):
    no_force = 0
    clip_force = 1
    frames_force = 2


class _DecoderStep(nn.Module):
    """One autoregressive decode step; scanned over the clip axis."""
    hidden_size: int
    num_layers: int
    output_size: int
    p_dropout: float
    residual: str  # 'none' | 'keep' | 'pure' | 'rot_mul'
    deterministic: bool

    @nn.compact
    def __call__(self, carry, step_inputs):
        lstm_states, prev_inp = carry
        force_mask, force_target = step_inputs

        h = prev_inp
        new_states = []
        for layer in range(self.num_layers):
            cell = torch_lstm_cell(self.hidden_size,
                                   name=f"lstm_{layer}")
            new_state, h = cell(lstm_states[layer], h)
            new_states.append(new_state)
            if layer < self.num_layers - 1:
                # torch ``nn.LSTM(dropout=p)`` semantics (reference Decoder,
                # ``seq2seq.py:72-78``): dropout BETWEEN stacked layers only,
                # never on the last layer's output (the reference defines
                # ``self.dropout`` but never applies it in ``forward``).
                h = nn.Dropout(self.p_dropout,
                               deterministic=self.deterministic)(h)
        output = TorchDense(self.output_size, name="fc_out")(h)

        if self.residual == "none":
            returned, next_inp = output, output
        elif self.residual == "keep":
            # ResidualA: residual kept in the returned output
            res = output + prev_inp
            returned, next_inp = res, res
        elif self.residual == "pure":
            # ResidualB: residual feeds the next step, pure output returned
            returned, next_inp = output, output + prev_inp
        elif self.residual == "rot_mul":
            # ResidualC: compose rotations multiplicatively
            def compose(a, b):
                mat = rotation_6d_to_matrix(a.reshape(a.shape[0], -1, 6)) \
                    @ rotation_6d_to_matrix(b.reshape(b.shape[0], -1, 6))
                return matrix_to_rotation_6d(mat).reshape(a.shape)
            res = compose(prev_inp, output)
            returned, next_inp = output, res
        else:
            raise ValueError(self.residual)

        if self.residual in ("keep", "pure"):
            forced = force_target + prev_inp
        elif self.residual == "rot_mul":
            def compose(a, b):
                mat = rotation_6d_to_matrix(a.reshape(a.shape[0], -1, 6)) \
                    @ rotation_6d_to_matrix(b.reshape(b.shape[0], -1, 6))
                return matrix_to_rotation_6d(mat).reshape(a.shape)
            forced = compose(prev_inp, force_target)
        else:
            forced = force_target
        next_inp = jnp.where(force_mask[:, None], forced, next_inp)

        return (tuple(new_states), next_inp), returned


class Seq2Seq(MovementsModel):
    hidden_size: int = 64
    num_layers: int = 2
    p_dropout: float = 0.2
    teacher_mode: str = "no_force"
    teacher_force_ratio: float = 0.2
    teacher_force_drop: float = 0.02  # per-epoch decay (hook via trainer)
    invert_sequence: bool = False
    bidirectional: bool = False
    residual: str = "none"
    #: lax.scan unroll factor for the encoder/decoder recurrences — identical
    #: math, fewer sequential loop iterations on device. A/B through the
    #: remote tunnel was inconclusive (run-to-run noise > unroll effect at
    #: the BASELINE batch-256 shape), so the default stays 1; retune on
    #: locally-attached hardware
    unroll: int = 1

    @property
    def needs_targets(self) -> bool:
        return TeacherMode[self.teacher_mode] != TeacherMode.no_force

    # -- input embedding (overridden by variants) --------------------------
    def _format_input(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, L, J, C) -> (B, L, E)."""
        return x.reshape(x.shape[0], x.shape[1], -1)

    def _target_output(self, targets) -> Optional[jnp.ndarray]:
        if targets is None:
            return None
        if self.movements_output_type == MovementsModelOutputType.pose_changes \
                and targets.get("pose_changes") is not None:
            t = matrix_to_rotation_6d(targets["pose_changes"])
        elif targets.get("projection_2d_transformed") is not None:
            t = targets["projection_2d_transformed"]
        else:
            return None
        return t.reshape(t.shape[0], t.shape[1], -1)

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        output_size = out_joints * self.output_features

        inp = self._format_input(x)
        if self.invert_sequence:
            inp = jnp.flip(inp, axis=1)

        # -- encoder -------------------------------------------------------
        carry = None
        h = inp
        enc_states = []
        # explicit zero carry in the input dtype: flax's default carry init
        # is fp32, which breaks the scan's carry-dtype invariant under
        # x64 (debug) and relies on implicit promotion under bf16
        zero_carry = (jnp.zeros((B, self.hidden_size), inp.dtype),
                      jnp.zeros((B, self.hidden_size), inp.dtype))
        # hoisted layers keep the flax-cell param subtree under the same
        # auto-names (``OptimizedLSTMCell_{n}``, construction order: fwd then
        # rev per layer) so checkpoints and ``models/torch_import.py`` load
        # unchanged
        cell_idx = 0
        for layer in range(self.num_layers):
            layer_in = h  # both directions read the SAME layer input, like
            # torch nn.LSTM(bidirectional=True): layer 0 the raw sequence,
            # deeper layers the previous layer's (2H) direction concat
            rnn = torch_hoisted_lstm(self.hidden_size, unroll=self.unroll,
                                     name=f"OptimizedLSTMCell_{cell_idx}")
            cell_idx += 1
            carry, h = rnn(layer_in, initial_carry=zero_carry)
            enc_states.append(carry)
            if self.bidirectional:
                rnn_b = torch_hoisted_lstm(
                    self.hidden_size, reverse=True, unroll=self.unroll,
                    name=f"OptimizedLSTMCell_{cell_idx}")
                cell_idx += 1
                carry_b, h_b = rnn_b(layer_in, initial_carry=zero_carry)
                # h_b comes back in processing order (last frame first);
                # flip to input order so frame t concatenates fwd state
                # *through* t with bwd state *from* t — torch's alignment
                h = jnp.concatenate([h, jnp.flip(h_b, axis=1)], axis=-1)
                # redesign vs the reference: its "bidirectional decoder" runs
                # an nn.LSTM(bidirectional=True) on single-frame sequences,
                # i.e. two independent cells seeded by the two directional
                # states with their outputs concatenated; here the
                # unidirectional scan decoder starts from the *mean* of the
                # two directional states instead (same information, half the
                # decoder params)
                enc_states[-1] = jax.tree_util.tree_map(
                    lambda a, b: (a + b) / 2, carry, carry_b)
            if layer < self.num_layers - 1:
                # between-layer dropout, torch ``nn.LSTM(dropout=p)``
                # semantics (reference Encoder ``seq2seq.py:37-43``)
                h = nn.Dropout(self.p_dropout,
                               deterministic=not training)(h)

        # -- teacher forcing mask -----------------------------------------
        mode = TeacherMode[self.teacher_mode]
        target_output = self._target_output(targets) if training else None
        needs_forcing = (training and mode != TeacherMode.no_force
                         and target_output is not None
                         and self.teacher_force_ratio > 0)
        if needs_forcing:
            rng = self.make_rng("dropout")
            if mode == TeacherMode.clip_force:
                mask = jax.random.uniform(rng, (1, B)) \
                    < self.teacher_force_ratio
                force_mask = jnp.broadcast_to(mask, (L, B))
            else:  # frames_force
                force_mask = jax.random.uniform(rng, (L, B)) \
                    < self.teacher_force_ratio
            force_targets = jnp.swapaxes(target_output, 0, 1)  # (L, B, E)
        else:
            force_mask = jnp.zeros((L, B), dtype=bool)
            force_targets = jnp.zeros((L, B, output_size), x.dtype)

        # -- decoder (scanned) --------------------------------------------
        scan = nn.scan(
            _DecoderStep,
            variable_broadcast="params",
            split_rngs={"params": False, "dropout": True},
            in_axes=0, out_axes=0, unroll=self.unroll)
        decoder = scan(hidden_size=self.hidden_size,
                       num_layers=self.num_layers,
                       output_size=output_size,
                       p_dropout=self.p_dropout,
                       residual=self.residual,
                       deterministic=not training,
                       name="decoder")
        # the scan carry must be dtype-stable: flax initializes LSTM carries
        # in fp32, while under mixed precision (bf16 params/inputs) the step
        # produces bf16 — cast every carry/step input to the compute dtype
        cdt = inp.dtype
        enc_states = jax.tree_util.tree_map(
            lambda s: s.astype(cdt), tuple(enc_states))
        if self.residual == "rot_mul":
            # the multiplicative-rotation residual composes 6D rotations with
            # the previous step's output; an all-zero start vector is a
            # degenerate rotation whose Gram-Schmidt normalization has
            # ~1/sqrt(eps)-scale gradients that overflow through the scan —
            # start from the identity rotation's 6D representation instead
            ident6 = jnp.asarray([1, 0, 0, 0, 1, 0], dtype=cdt)
            init_inp = jnp.broadcast_to(
                jnp.tile(ident6, output_size // 6), (B, output_size))
        else:
            init_inp = jnp.zeros((B, output_size), cdt)
        (_, _), outputs = decoder(
            (enc_states, init_inp),
            (force_mask, force_targets.astype(cdt)))

        outputs = jnp.swapaxes(outputs, 0, 1)  # (B, L, E) batch-first
        outputs = outputs.reshape(B, L, out_joints, self.output_features)
        return self.format_output(outputs)


class Seq2SeqEmbeddings(Seq2Seq):
    """Per-joint Dense(2 -> E) embeddings (reference
    ``seq2seq_embeddings.py:56-78``; one Linear per joint, expressed here as a
    single grouped einsum over a (J, 2, E) weight tensor)."""
    single_joint_embeddings_size: int = 64

    def _format_input(self, x):
        J = len(self.input_nodes)
        emb_init = torch_uniform_init(1.0 / np.sqrt(2.0))
        w = self.param("joint_embeddings", emb_init,
                       (J, 2, self.single_joint_embeddings_size))
        b = self.param("joint_embeddings_bias", emb_init,
                       (J, self.single_joint_embeddings_size))
        emb = jnp.einsum("bljc,jce->blje", x[..., :2], w) + b
        return emb.reshape(x.shape[0], x.shape[1], -1)


class Seq2SeqFlatEmbeddings(Seq2Seq):
    """MLP embedding over flattened joints (reference
    ``seq2seq_flat_embeddings.py``; default sizes [128, 64])."""
    embeddings_size: Sequence[int] = (128, 64)

    def _format_input(self, x):
        B, L = x.shape[:2]
        h = x.reshape(B * L, -1)
        for width in self.embeddings_size:
            h = nn.relu(nn.Dense(width)(h))
        return h.reshape(B, L, -1)


class Seq2SeqResidualA(Seq2SeqEmbeddings):
    residual: str = "keep"


class Seq2SeqResidualB(Seq2SeqEmbeddings):
    residual: str = "pure"


class Seq2SeqResidualC(Seq2SeqEmbeddings):
    residual: str = "rot_mul"
