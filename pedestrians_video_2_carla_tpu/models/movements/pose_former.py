"""PoseFormer (Zheng et al., ICCV'21): spatial transformer over joints per
frame + temporal transformer over the receptive window, predicting the center
frame's 3D pose.

Reference wrapper: ``modules/movements/pose_former/pose_former.py:17-138``
(sliding window of ``receptive_frames`` over the clip, center-out writes,
``eval_slice`` trimming the uncovered edges). TPU-first: instead of a Python
loop invoking the transformer per window, the spatial transformer (which only
mixes joints within a single frame) runs once per *distinct* frame — (B*L)
sequences instead of the reference's (B*W*rf) window-folded frame instances,
an exact rf/(~1)-fold dedup of overlapping-window work — and only then are the
per-frame embeddings gathered into the L-rf+1 sliding windows and folded into
the batch axis for the temporal transformer; window-center predictions are
scattered back to their frame positions.

Intended training-time semantics change from the dedup: spatial-stage dropout
draws ONE mask per distinct frame, shared by every window that overlaps it,
whereas the reference drops independently per window instance. Inference
parity is exact (multi-window torch-parity test in
``tests/models/test_pose_former.py``); training-parity comparisons should
expect slightly less dropout noise at equal rates.

``PoseFormerRot`` is the 6D-rotations variant (``pose_former_rot.py``)."""

import functools

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...flows.output_types import MovementsModelOutputType
from ...ops.rotations import rotation_6d_to_matrix
from .common import MovementsModel

#: torch nn.LayerNorm default eps (flax defaults to 1e-6; the reference's
#: timm-style blocks use torch's 1e-5 — the difference is visible at 1e-4
#: weight-import parity)
_LayerNorm = functools.partial(nn.LayerNorm, epsilon=1e-5)


class _Mlp(nn.Module):
    hidden: int
    out: int
    drop: float

    @nn.compact
    def __call__(self, x, training: bool = False):
        x = nn.Dense(self.hidden)(x)
        x = nn.gelu(x, approximate=False)  # torch F.gelu default (erf)
        x = nn.Dropout(self.drop, deterministic=not training)(x)
        x = nn.Dense(self.out)(x)
        return nn.Dropout(self.drop, deterministic=not training)(x)


class _Attention(nn.Module):
    """timm-style self-attention with the torch-packed qkv projection kept
    FUSED: one (D -> 3D) matmul instead of flax MultiHeadDotProductAttention's
    three DenseGenerals. At PoseFormer's small widths (spatial D=32) a D x D
    matmul occupies a sliver of a 128x128 MXU tile, so 3 separate qkv matmuls
    waste ~3x the tile issue slots the fused one does; the packed layout also
    matches the reference checkpoint format byte-for-byte
    (``models/torch_import.py::_attention``)."""
    dim: int
    num_heads: int
    attn_drop: float

    @nn.compact
    def __call__(self, x, training: bool = False):
        B, T, D = x.shape
        H = self.num_heads
        hd = D // H
        qkv = nn.Dense(3 * D, name="qkv")(x)
        qkv = qkv.reshape(B, T, 3, H, hd).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]            # (B, H, T, hd)
        attn = jnp.einsum("bhqd,bhkd->bhqk", q * (hd ** -0.5), k)
        attn = jax.nn.softmax(attn, axis=-1)
        attn = nn.Dropout(self.attn_drop, deterministic=not training)(attn)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, T, D)
        return nn.Dense(D, name="proj")(out)


class _Block(nn.Module):
    """Pre-norm transformer block (timm-style, as used by PoseFormer)."""
    dim: int
    num_heads: int
    mlp_ratio: float
    drop: float
    attn_drop: float

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = _LayerNorm()(x)
        y = _Attention(self.dim, self.num_heads, self.attn_drop)(y, training)
        x = x + nn.Dropout(self.drop, deterministic=not training)(y)
        y = _LayerNorm()(x)
        y = _Mlp(int(self.dim * self.mlp_ratio), self.dim, self.drop)(
            y, training)
        return x + y


class _LNParams(nn.Module):
    """Parameter shell: declares exactly ``nn.LayerNorm``'s params (same
    names, shapes, initializers) WITHOUT the compute — the fused Pallas
    spatial kernel consumes the raw arrays, and the shells keep the param
    tree bit-identical to the XLA path (same init RNG draws, torch-import
    and checkpoint compatible either way)."""
    dim: int

    @nn.compact
    def __call__(self):
        return (self.param("scale", nn.initializers.ones_init(), (self.dim,)),
                self.param("bias", nn.initializers.zeros_init(), (self.dim,)))


class _DenseParams(nn.Module):
    fin: int
    fout: int

    @nn.compact
    def __call__(self):
        return (self.param("kernel", nn.initializers.lecun_normal(),
                           (self.fin, self.fout)),
                self.param("bias", nn.initializers.zeros_init(),
                           (self.fout,)))


class _AttnParams(nn.Module):
    dim: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.dim, 3 * self.dim, name="qkv")(),
                _DenseParams(self.dim, self.dim, name="proj")())


class _MlpParams(nn.Module):
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        return (_DenseParams(self.dim, self.hidden, name="Dense_0")(),
                _DenseParams(self.hidden, self.dim, name="Dense_1")())


class _BlockParams(nn.Module):
    """Shell mirroring ``_Block``'s param tree (LayerNorm_0, _Attention_0,
    LayerNorm_1, _Mlp_0 — flax's auto-names for the unnamed children)."""
    dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        ln1 = _LNParams(self.dim, name="LayerNorm_0")()
        qkv, proj = _AttnParams(self.dim, name="_Attention_0")()
        ln2 = _LNParams(self.dim, name="LayerNorm_1")()
        fc1, fc2 = _MlpParams(self.dim, self.hidden, name="_Mlp_0")()
        return ln1, qkv, proj, ln2, fc1, fc2


class PoseFormer(MovementsModel):
    clip_length: int = 30
    receptive_frames: int = 9
    single_joint_embeddings_size: int = 32
    depth: int = 4
    num_heads: int = 8
    mlp_ratio: float = 2.0
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    remat: bool = False
    #: "pallas" fuses the whole spatial stage (depth blocks + spatial_norm)
    #: into one hand-written TPU kernel with a hand-written backward
    #: (``ops/pallas/fused_spatial_transformer.py``): measured 29 -> 4.8 ms
    #: fwd / 99 -> 23 ms fwd+bwd at the B1024 bench shape, 1.47x the whole
    #: train step (270 -> 184 ms bf16). The param tree is identical to the
    #: XLA path (parameter shells), so checkpoints are interchangeable.
    #: Requires drop_rate == attn_drop_rate == 0 when training (the kernel
    #: implements no dropout); ``remat`` is ignored for the spatial stage
    #: (the kernel backward is already recompute-based). The default "auto"
    #: picks pallas on TPU whenever eligible and the XLA blocks otherwise
    #: (CPU interpret mode would be slow; dropout needs the XLA path).
    spatial_kernel: str = "auto"
    #: same idea for the temporal stage (frames as tokens, frame_dim=J*emb):
    #: "pallas" runs each temporal block as one fused kernel with the
    #: window/batch dim in lanes and fully lane-sliced attention
    #: (``ops/pallas/fused_temporal_transformer``, hand-written backward).
    #: The XLA stack pays 9-token sublane padding (9 -> 16) plus relayout
    #: glue around every op; the kernel measured 54.7 -> 26.1 ms fwd /
    #: 166.3 -> 96.6 ms fwd+bwd for the depth-4 stack at the B1024 bench
    #: shape (8192, 9, 832) — 1.47x the whole bf16 train step (5.5k -> 8.1k
    #: clips/s). r5: the default token-leading slab layout cuts the stack
    #: to 78.9 ms fwd+bwd (bf16; fp32 85.4 at half-width grids) and the
    #: whole stage runs slab-resident — windows are built as lane slices
    #: of the frame embeddings and the head pools on the slab — for
    #: full-step 10.2k clips/s bf16 / 9.4k fp32 (the "auto" kernel now
    #: covers BOTH precisions; fp32 on the legacy padded layout still
    #: OOMs). Same dropout/"auto" rules as ``spatial_kernel``; the param
    #: tree is identical either way.
    temporal_kernel: str = "auto"
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.absolute_loc

    @property
    def _out_features(self):
        return 3

    @property
    def eval_slice(self):
        shift = self.receptive_frames // 2
        return slice(shift, self.clip_length - self.receptive_frames
                     + shift + 1)

    def _windows(self, x):
        """(B, L, ...) -> (B, W, rf, ...) sliding windows."""
        L = x.shape[1]
        rf = self.receptive_frames
        W = L - rf + 1
        starts = jnp.arange(W)[:, None] + jnp.arange(rf)[None, :]  # (W, rf)
        return x[:, starts]  # gather -> (B, W, rf, ...)

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L, J, C = x.shape
        rf = self.receptive_frames
        W = L - rf + 1
        emb = self.single_joint_embeddings_size
        frame_dim = J * emb
        # optional rematerialization of transformer blocks under grad:
        # trades ~18% step time for activation memory (measured on v5e at
        # batch 512); off by default — the batch-1024 remote-compile failure
        # is a compiler-process limit, not activation memory
        Block = nn.remat(_Block, static_argnums=(2,)) if self.remat \
            else _Block

        # spatial transformer: joints as tokens, once per distinct frame —
        # the spatial stage never mixes frames, so overlapping windows share
        # frame embeddings exactly (B*L sequences instead of B*W*rf)
        s = nn.Dense(emb, name="spatial_patch_embed")(
            x[..., :2])                               # (B, L, J, emb)
        s = s + self.param("spatial_pos_embed",
                           nn.initializers.truncated_normal(0.02),
                           (1, 1, J, emb))
        s = nn.Dropout(self.drop_rate, deterministic=not training)(s)
        s = s.reshape(B * L, J, emb)
        block_dropout = training and (self.drop_rate > 0
                                      or self.attn_drop_rate > 0)
        kernel = self.spatial_kernel
        if kernel == "auto":
            kernel = "pallas" if (jax.default_backend() == "tpu"
                                  and not block_dropout) else "xla"
        if kernel == "pallas":
            if block_dropout:
                raise ValueError(
                    "spatial_kernel='pallas' implements no dropout inside "
                    "the fused blocks; train with drop_rate=0/"
                    "attn_drop_rate=0 or spatial_kernel='xla'/'auto'")
            from ...ops.pallas.fused_spatial_transformer import \
                fused_spatial_stack
            hidden = int(emb * self.mlp_ratio)
            per_block = [_BlockParams(emb, hidden,
                                      name=f"spatial_block_{i}")()
                         for i in range(self.depth)]
            lnf_s, lnf_b = _LNParams(emb, name="spatial_norm")()
            stck = jnp.stack
            weights = (
                stck([b[0][0] for b in per_block]),   # ln1 scale
                stck([b[0][1] for b in per_block]),   # ln1 bias
                stck([b[1][0] for b in per_block]),   # qkv kernel
                stck([b[1][1] for b in per_block]),   # qkv bias
                stck([b[2][0] for b in per_block]),   # proj kernel
                stck([b[2][1] for b in per_block]),   # proj bias
                stck([b[3][0] for b in per_block]),   # ln2 scale
                stck([b[3][1] for b in per_block]),   # ln2 bias
                stck([b[4][0] for b in per_block]),   # fc1 kernel
                stck([b[4][1] for b in per_block]),   # fc1 bias
                stck([b[5][0] for b in per_block]),   # fc2 kernel
                stck([b[5][1] for b in per_block]),   # fc2 bias
                lnf_s[None], lnf_b[None],
            )
            weights = jax.tree_util.tree_map(
                lambda w: w.astype(s.dtype), weights)
            s = fused_spatial_stack(s, weights, self.num_heads)
        else:
            for i in range(self.depth):
                s = Block(emb, self.num_heads, self.mlp_ratio,
                          self.drop_rate, self.attn_drop_rate,
                          name=f"spatial_block_{i}")(s, training)
            s = _LayerNorm(name="spatial_norm")(s)

        # gather per-frame embeddings into sliding windows for the temporal
        # transformer: frames as tokens
        s_flat = s.reshape(B, L, frame_dim)
        pos_embed = self.param("temporal_pos_embed",
                               nn.initializers.truncated_normal(0.02),
                               (1, rf, frame_dim))
        t_dtype = jnp.promote_types(s_flat.dtype, pos_embed.dtype)
        t_kernel = self.temporal_kernel
        if t_kernel == "auto":
            # both precisions under the token-leading layout (r5): fp32
            # runs half the bf16 grid widths for the same VMEM footprint
            # (ops/pallas/fused_temporal_transformer._tl_widths) and the
            # full fp32 train step measured 9,408 vs 4,090 clips/s on the
            # flax blocks (B1024; the legacy padded layout OOMed fp32 at
            # any width — that negative result is obsolete)
            from ...ops.pallas import fused_temporal_transformer as _ftt
            ok_dtype = (t_dtype == jnp.bfloat16
                        or (t_dtype == jnp.float32 and _ftt.LAYOUT == "tl"))
            t_kernel = "pallas" if (jax.default_backend() == "tpu"
                                    and ok_dtype
                                    and not block_dropout) else "xla"

        def build_t():
            # (B*W, rf, D) window tokens for the XLA/legacy paths (the
            # outer Dropout is identity on any pallas path: block_dropout
            # gates it off)
            windows = self._windows(s_flat)                # (B, W, rf, D)
            tt = windows.reshape(B * W, rf, frame_dim) + pos_embed
            return nn.Dropout(self.drop_rate,
                              deterministic=not training)(tt)

        w_major = False
        if t_kernel == "pallas":
            if block_dropout:
                raise ValueError(
                    "temporal_kernel='pallas' implements no dropout inside "
                    "the fused blocks; train with drop_rate=0/"
                    "attn_drop_rate=0 or temporal_kernel='xla'/'auto'")
            from ...ops.pallas import fused_temporal_transformer as ftt
            hidden_t = int(frame_dim * self.mlp_ratio)
            weights_list = []
            for i in range(self.depth):
                ln1, qkv, proj, ln2, fc1, fc2 = _BlockParams(
                    frame_dim, hidden_t, name=f"temporal_block_{i}")()
                flat = (ln1[0], ln1[1], qkv[0], qkv[1], proj[0], proj[1],
                        ln2[0], ln2[1], fc1[0], fc1[1], fc2[0], fc2[1])
                weights_list.append(jax.tree_util.tree_map(
                    lambda w: w.astype(t_dtype), flat))
            if ftt.LAYOUT == "tl":
                # slab-resident end to end (r5): window token t is the
                # contiguous lane range [t*B, (t+W)*B) of the frame-major
                # (D, L*B) flat embeddings (lane = l*B + b), so the
                # sliding-window gather + pos-embed + entry transpose
                # collapse into one small relayout + rf free lane slices;
                # the stack returns its (T, D, Np) slab, LN runs with
                # feature axis 1, the token mean is a leading-axis
                # contraction, and only the pooled (D, N) transposes back.
                # The (N, rf, D) intermediates this replaces re-padded the
                # 9-token sublane axis to 16 (~217 MB/pass at B1024) and
                # the stack round-trip re-laid out 122 MB per direction.
                # Token order is w-major (n = w*B + b) — undone at `out`.
                # Param tree identical: same names, same shapes.
                sd = jnp.transpose(s_flat.astype(t_dtype),
                                   (2, 1, 0)).reshape(frame_dim, L * B)
                pe = pos_embed[0].astype(t_dtype)      # (rf, D)
                slab = jnp.stack(
                    [sd[:, t0 * B:(t0 + W) * B] + pe[t0][:, None]
                     for t0 in range(rf)], axis=0)
                slab, n = ftt.fused_temporal_stack_from_slabs(
                    slab, weights_list, self.num_heads)
                slab = nn.LayerNorm(epsilon=1e-5, reduction_axes=1,
                                    feature_axes=1,
                                    name="temporal_norm")(slab)
                w = self.param("weighted_mean",
                               nn.initializers.normal(0.02), (rf,))
                w_b = self.param("weighted_mean_bias",
                                 nn.initializers.zeros, (1,))
                pooled = (jnp.einsum("tdn,t->dn", slab,
                                     w.astype(slab.dtype)).T + w_b)[:n]
                w_major = True
            else:
                # slab-resident stack: one (N,T,D)<->(D,T,Np) layout
                # round-trip for the whole depth instead of one per block
                # per pass
                t = ftt.fused_temporal_stack(build_t(), weights_list,
                                             self.num_heads)
                pooled = None
        else:
            t = build_t()
            for i in range(self.depth):
                t = Block(frame_dim, self.num_heads, self.mlp_ratio,
                          self.drop_rate, self.attn_drop_rate,
                          name=f"temporal_block_{i}")(t, training)
            pooled = None
        if pooled is None:
            t = _LayerNorm(name="temporal_norm")(t)

            # weighted mean over the rf frames (PoseFormer's Conv1d(rf, 1,
            # 1), including its scalar bias for checkpoint compatibility)
            w = self.param("weighted_mean", nn.initializers.normal(0.02),
                           (rf,))
            w_b = self.param("weighted_mean_bias", nn.initializers.zeros,
                             (1,))
            pooled = jnp.einsum("nfd,f->nd", t, w) + w_b  # (BW, frame_dim)

        out = nn.Dense(J * self._out_features, name="head")(
            _LayerNorm(name="head_norm")(pooled))
        if w_major:  # slab path rows are n = w*B + b
            out = out.reshape(W, B, J, self._out_features).swapaxes(0, 1)
        else:
            out = out.reshape(B, W, J, self._out_features)

        # scatter window-center predictions to their frame positions; edge
        # frames keep zeros (exactly what eval_slice trims — reference
        # pose_former.py:113-127)
        shift = rf // 2
        full = jnp.zeros((B, L, J, self._out_features), out.dtype)
        full = full.at[:, shift:shift + W].set(out)
        return self._finalize(full)

    def _finalize(self, out):
        return out

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.absolute_loc]


class PoseFormerRot(PoseFormer):
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.relative_rot

    @property
    def _out_features(self):
        return 6

    def _finalize(self, out):
        return rotation_6d_to_matrix(out)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.relative_rot]
