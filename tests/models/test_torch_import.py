"""Weight-import equivalence: torch models laid out exactly like the
reference's (state_dict key layout included) are randomly initialized,
imported, and must match the flax forward to ~1e-4 (the BASELINE.json
weight-compatibility requirement)."""
import numpy as np
import pytest
import torch
import torch.nn as nn

import jax
import jax.numpy as jnp

from pedestrians_video_2_carla_tpu.flows.output_types import \
    MovementsModelOutputType as MOT
from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS
from pedestrians_video_2_carla_tpu.models.torch_import import (
    import_linear_ae, import_pose_former, import_seq2seq_embeddings,
    import_video_pose_3d)

torch.manual_seed(0)
B, L, J = 2, 12, 26


def _sd(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


def test_linear_ae_import(rng):
    class LinearAE(nn.Module):
        def __init__(self):
            super().__init__()
            in_size, out_size = J * 2, J * 6
            self.__encoder = nn.Sequential(
                nn.Linear(in_size, in_size // 2), nn.ReLU(),
                nn.Linear(in_size // 2, in_size // 4), nn.ReLU(),
                nn.Linear(in_size // 4, in_size // 8), nn.ReLU())
            self.__decoder = nn.Sequential(
                nn.Linear(in_size // 8, out_size // 4), nn.ReLU(),
                nn.Linear(out_size // 4, out_size // 2), nn.ReLU(),
                nn.Linear(out_size // 2, out_size))

        def forward(self, x):
            h = x.view(-1, J * 2)
            return self.__decoder(self.__encoder(h)).view(B, L, J, 6)

    tm = LinearAE().eval()
    x = rng.normal(size=(B, L, J, 2)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(x)).numpy()

    fm = MOVEMENTS_MODELS["LinearAE"]()
    params = import_linear_ae(_sd(tm))
    # compare the raw 6D output: run through the model up to format_output by
    # using the rotation matrices of both (same conversion both sides)
    out = fm.apply({"params": params}, jnp.asarray(x), training=False)
    from pedestrians_video_2_carla_tpu.ops.rotations import rotation_6d_to_matrix
    expected_mat = np.asarray(rotation_6d_to_matrix(jnp.asarray(expected)))
    np.testing.assert_allclose(np.asarray(out), expected_mat, atol=1e-4)


def test_seq2seq_embeddings_import(rng):
    E, H = 16, 64
    out_size = J * 2

    class Encoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTM(J * E, H, num_layers=2)

        def forward(self, x):
            _, (h, c) = self.rnn(x)
            return h, c

    class Decoder(nn.Module):
        def __init__(self):
            super().__init__()
            self.rnn = nn.LSTM(out_size, H, num_layers=2)
            self.fc_out = nn.Linear(H, out_size)

        def forward(self, x, hidden, cell):
            out, (h, c) = self.rnn(x.unsqueeze(0), (hidden, cell))
            return self.fc_out(out.squeeze(0)), h, c

    class Seq2SeqEmbeddings(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = Encoder()
            self.decoder = Decoder()
            self.embeddings = nn.ModuleList(
                [nn.Linear(2, E) for _ in range(J)])

        def forward(self, x):
            x = x.permute(1, 0, 2, 3)  # sequence-first
            emb = torch.stack([self.embeddings[j](x[:, :, j])
                               for j in range(J)], dim=2)
            hidden, cell = self.encoder(emb.reshape(L, B, J * E))
            inp = torch.zeros((B, out_size))
            outputs = []
            for _ in range(L):
                inp, hidden, cell = self.decoder(inp, hidden, cell)
                outputs.append(inp)
            return torch.stack(outputs).permute(1, 0, 2).view(B, L, J, 2)

    tm = Seq2SeqEmbeddings().eval()
    x = rng.normal(size=(B, L, J, 2)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(x)).numpy()

    fm = MOVEMENTS_MODELS["Seq2SeqEmbeddings"](
        movements_output_type=MOT.pose_2d, single_joint_embeddings_size=E,
        p_dropout=0.0)
    params = import_seq2seq_embeddings(_sd(tm))
    out = fm.apply({"params": params}, jnp.asarray(x), training=False,
                   rngs={"dropout": jax.random.PRNGKey(0)})
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)


def test_video_pose_3d_import(rng):
    C = 64
    widths = (3, 3)
    rf = 9
    pad = rf // 2

    class TemporalModel(nn.Module):
        def __init__(self):
            super().__init__()
            self.expand_conv = nn.Conv1d(J * 2, C, widths[0], bias=False)
            self.expand_bn = nn.BatchNorm1d(C, momentum=0.1)
            self.layers_conv = nn.ModuleList([
                nn.Conv1d(C, C, widths[1], dilation=widths[0], bias=False),
                nn.Conv1d(C, C, 1, bias=False)])
            self.layers_bn = nn.ModuleList([
                nn.BatchNorm1d(C, momentum=0.1),
                nn.BatchNorm1d(C, momentum=0.1)])
            self.shrink = nn.Conv1d(C, J * 3, 1)

        def forward(self, x):
            # x: (B, L, J*2); edge-pad like the flax model
            h = torch.nn.functional.pad(
                x.permute(0, 2, 1), (pad, pad), mode="replicate")
            h = torch.relu(self.expand_bn(self.expand_conv(h)))
            crop = widths[0] * (widths[1] - 1) // 2
            res = h[:, :, crop:h.shape[2] - crop]
            y = torch.relu(self.layers_bn[0](self.layers_conv[0](h)))
            y = torch.relu(self.layers_bn[1](self.layers_conv[1](y)))
            h = res + y
            return self.shrink(h).permute(0, 2, 1).view(B, L, J, 3)

    tm = TemporalModel().eval()
    # randomize BN stats so the import is actually exercised
    for bn in [tm.expand_bn, *tm.layers_bn]:
        bn.running_mean.normal_()
        bn.running_var.uniform_(0.5, 2.0)
    x = rng.normal(size=(B, L, J, 2)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(x.reshape(B, L, -1))).numpy()

    fm = MOVEMENTS_MODELS["VideoPose3D"](filter_widths=widths, channels=C)
    params, batch_stats = import_video_pose_3d(_sd(tm))
    out = fm.apply({"params": params, "batch_stats": batch_stats},
                   jnp.asarray(x), training=False)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-3)


def _build_mini_poseformer(emb, heads, depth, rf):
    frame_dim = J * emb

    class Mlp(nn.Module):
        def __init__(self, dim, hidden):
            super().__init__()
            self.fc1 = nn.Linear(dim, hidden)
            self.fc2 = nn.Linear(hidden, dim)

        def forward(self, x):
            return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

    class Attention(nn.Module):
        def __init__(self, dim):
            super().__init__()
            self.qkv = nn.Linear(dim, dim * 3, bias=True)
            self.proj = nn.Linear(dim, dim)
            self.dim = dim

        def forward(self, x):
            Bn, N, D = x.shape
            hd = D // heads
            qkv = self.qkv(x).reshape(Bn, N, 3, heads, hd) \
                .permute(2, 0, 3, 1, 4)
            q, k, v = qkv[0], qkv[1], qkv[2]
            attn = (q @ k.transpose(-2, -1)) * (hd ** -0.5)
            attn = attn.softmax(dim=-1)
            x = (attn @ v).transpose(1, 2).reshape(Bn, N, D)
            return self.proj(x)

    class Block(nn.Module):
        def __init__(self, dim, mlp_ratio=2.0):
            super().__init__()
            self.norm1 = nn.LayerNorm(dim)
            self.attn = Attention(dim)
            self.norm2 = nn.LayerNorm(dim)
            self.mlp = Mlp(dim, int(dim * mlp_ratio))

        def forward(self, x):
            x = x + self.attn(self.norm1(x))
            return x + self.mlp(self.norm2(x))

    class PoseTransformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.Spatial_patch_to_embedding = nn.Linear(2, emb)
            self.Spatial_pos_embed = nn.Parameter(torch.zeros(1, J, emb))
            self.Temporal_pos_embed = nn.Parameter(
                torch.zeros(1, rf, frame_dim))
            self.Spatial_blocks = nn.ModuleList(
                [Block(emb) for _ in range(depth)])
            self.blocks = nn.ModuleList(
                [Block(frame_dim) for _ in range(depth)])
            self.Spatial_norm = nn.LayerNorm(emb)
            self.Temporal_norm = nn.LayerNorm(frame_dim)
            self.weighted_mean = nn.Conv1d(rf, 1, 1)
            self.head = nn.Sequential(nn.LayerNorm(frame_dim),
                                      nn.Linear(frame_dim, J * 3))
            nn.init.normal_(self.Spatial_pos_embed, std=0.02)
            nn.init.normal_(self.Temporal_pos_embed, std=0.02)

        def forward(self, x):  # (B, rf, J, 2)
            b = x.shape[0]
            s = self.Spatial_patch_to_embedding(x) + self.Spatial_pos_embed
            s = s.reshape(b * rf, J, emb)
            for blk in self.Spatial_blocks:
                s = blk(s)
            s = self.Spatial_norm(s)
            t = s.reshape(b, rf, frame_dim) + self.Temporal_pos_embed
            for blk in self.blocks:
                t = blk(t)
            t = self.Temporal_norm(t)
            t = self.weighted_mean(t)
            return self.head(t.squeeze(1)).view(b, 1, J, 3)

    return PoseTransformer().eval()


def test_pose_former_import(rng):
    emb, heads, depth, rf = 8, 2, 1, 3
    tm = _build_mini_poseformer(emb, heads, depth, rf)
    x = rng.normal(size=(B, rf, J, 2)).astype(np.float32)
    with torch.no_grad():
        expected = tm(torch.from_numpy(x)).numpy()

    fm = MOVEMENTS_MODELS["PoseFormer"](
        clip_length=rf, receptive_frames=rf,
        single_joint_embeddings_size=emb, depth=depth, num_heads=heads,
        drop_rate=0.0, attn_drop_rate=0.0)
    params = import_pose_former(_sd(tm), depth=depth, num_heads=heads)
    out = fm.apply({"params": params}, jnp.asarray(x), training=False,
                   rngs={"dropout": jax.random.PRNGKey(0)})
    # clip_length == rf -> single window; the center frame carries the
    # prediction and also fills [shift, shift+W) = exactly one frame
    center = rf // 2
    np.testing.assert_allclose(np.asarray(out)[:, center],
                               expected[:, 0], atol=1e-4)




def test_pose_former_import_multi_window(rng):
    """Multi-window parity: the reference slides the transformer over every
    rf-frame window and writes center-frame predictions
    (``pose_former.py:113-127``); our implementation dedups the spatial
    stage across overlapping windows and scatters the centers — outputs
    must match the torch sliding-window loop exactly."""
    emb, heads, depth, rf, L = 8, 2, 1, 3, 7

    # rebuild the same torch mini-PoseTransformer used by the single-window
    # test by calling it again at rf and sliding it manually over the clip
    torch_mod = _build_mini_poseformer(emb, heads, depth, rf)
    x = rng.normal(size=(B, L, J, 2)).astype(np.float32)
    W = L - rf + 1
    shift = rf // 2
    expected = np.zeros((B, L, J, 3), np.float32)
    with torch.no_grad():
        for s in range(W):
            win = torch.from_numpy(x[:, s:s + rf])
            expected[:, s + shift] = torch_mod(win).numpy()[:, 0]

    fm = MOVEMENTS_MODELS["PoseFormer"](
        clip_length=L, receptive_frames=rf,
        single_joint_embeddings_size=emb, depth=depth, num_heads=heads,
        drop_rate=0.0, attn_drop_rate=0.0)
    params = import_pose_former(_sd(torch_mod), depth=depth, num_heads=heads)
    out = fm.apply({"params": params}, jnp.asarray(x), training=False,
                   rngs={"dropout": jax.random.PRNGKey(0)})
    out = np.asarray(out)
    # edge frames outside window coverage stay zero
    assert np.all(out[:, :shift] == 0) and np.all(out[:, shift + W:] == 0)
    np.testing.assert_allclose(out[:, shift:shift + W],
                               expected[:, shift:shift + W], atol=1e-4)
