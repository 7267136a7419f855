"""Pose-estimation video models + video pipeline tests."""
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pedestrians_video_2_carla_tpu.models.pose_estimation import \
    POSE_ESTIMATION_MODELS

B, L, H, W = 1, 2, 64, 64


def _apply(model, x, training=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, training=False)
    out = model.apply(variables, x, training=False,
                      rngs={"dropout": jax.random.PRNGKey(2)})
    return out


def test_unipose_lstm_heatmaps(rng):
    model = POSE_ESTIMATION_MODELS["UniPoseLSTM"](backbone="resnet50",
                                                  stride=8)
    x = jnp.asarray(rng.normal(size=(B, L, H, W, 3)).astype(np.float32))
    out = _apply(model, x)
    assert out.shape == (B, L, 27, H // 8, W // 8)  # 26 joints + background


def test_p0_and_transformer_regressors(rng):
    x = jnp.asarray(rng.normal(size=(B, L, H, W, 3)).astype(np.float32))
    for name in ("P0", "AvPedestrianPoseTransformer"):
        model = POSE_ESTIMATION_MODELS[name]()
        out = _apply(model, x)
        assert out.shape == (B, L, 26, 2), name


def test_resnet_import_layout():
    """Importer consumes a torchvision-layout state_dict (synthesized)."""
    from pedestrians_video_2_carla_tpu.models.backbones.resnet import (
        import_torchvision_resnet, resnet50)
    rng = np.random.default_rng(0)
    sd = {}

    def conv(name, out_c, in_c, k):
        sd[f"{name}.weight"] = rng.normal(
            size=(out_c, in_c, k, k)).astype(np.float32)

    def bnorm(name, c):
        sd[f"{name}.weight"] = np.ones(c, np.float32)
        sd[f"{name}.bias"] = np.zeros(c, np.float32)
        sd[f"{name}.running_mean"] = np.zeros(c, np.float32)
        sd[f"{name}.running_var"] = np.ones(c, np.float32)

    conv("conv1", 64, 3, 7)
    bnorm("bn1", 64)
    stage_sizes = (3, 4, 6, 3)
    in_c = 64
    for stage, blocks in enumerate(stage_sizes):
        feat = 64 * 2 ** stage
        for b in range(blocks):
            t = f"layer{stage+1}.{b}"
            conv(f"{t}.conv1", feat, in_c if b == 0 else feat * 4, 1)
            bnorm(f"{t}.bn1", feat)
            conv(f"{t}.conv2", feat, feat, 3)
            bnorm(f"{t}.bn2", feat)
            conv(f"{t}.conv3", feat * 4, feat, 1)
            bnorm(f"{t}.bn3", feat * 4)
            if b == 0:
                conv(f"{t}.downsample.0", feat * 4,
                     in_c if stage == 0 else feat * 2, 1)
                bnorm(f"{t}.downsample.1", feat * 4)
        in_c = feat * 4

    params, stats = import_torchvision_resnet(sd, stage_sizes)
    model = resnet50()
    x = jnp.zeros((1, 64, 64, 3))
    high, low = model.apply({"params": params, "batch_stats": stats}, x,
                            training=False)
    assert high.shape[-1] == 2048 and low.shape[-1] == 256


def test_video_mixin_reads_synthesized_mp4(tmp_path):
    import cv2

    from pedestrians_video_2_carla_tpu.data.base.video_mixin import (
        read_clip_frames, square_crop, to_model_frames)

    path = str(tmp_path / "vid.mp4")
    writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                             30, (64, 48))
    for i in range(10):
        frame = np.full((48, 64, 3), i * 20, np.uint8)
        writer.write(frame)
    writer.release()

    frames = read_clip_frames(path, 2, 6)
    assert frames is not None and frames.shape == (4, 48, 64, 3)
    cropped = square_crop(frames, np.asarray([[10, 10], [40, 40]],
                                             np.float32))
    assert cropped.shape[1] == cropped.shape[2]  # square
    model_in = to_model_frames(frames, (32, 32))
    assert model_in.shape == (4, 32, 32, 3)
    assert model_in.dtype == np.float32
