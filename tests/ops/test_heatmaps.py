"""Heatmap rendering/decoding (ops/heatmaps.py vs reference
``utils/gaussian_kernel.py`` + ``pose_estimation.py:96-134``)."""
import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.ops.heatmaps import (
    downsample_heatmaps, gaussian_heatmaps, keypoints_from_heatmaps)


def test_gaussian_tails_clipped_like_reference():
    # reference gaussian_kernel.py: gmap[gmap < 0.0099] = 0 — without it
    # every pixel is slightly nonzero and the background channel shifts
    maps = gaussian_heatmaps(jnp.asarray([[20.0, 15.0]]), (64, 48),
                             sigma=3.0, add_background=False)
    m = np.asarray(maps[0])
    assert ((m == 0) | (m >= 0.0099)).all()
    assert m.max() > 0.99
    # far corner is exactly zero
    assert m[0, 0] == 0.0


def test_background_channel_is_one_minus_max():
    kp = jnp.asarray([[10.0, 10.0], [30.0, 20.0]])
    maps = gaussian_heatmaps(kp, (64, 48), sigma=3.0, add_background=True)
    m = np.asarray(maps)
    assert m.shape == (3, 48, 64)
    np.testing.assert_allclose(m[-1], 1.0 - m[:-1].max(axis=0), atol=1e-6)


def test_missing_keypoint_renders_empty_map():
    kp = jnp.asarray([[0.0, 0.0], [30.0, 20.0]])
    maps = gaussian_heatmaps(kp, (64, 48), add_background=False)
    assert np.asarray(maps[0]).max() == 0.0
    assert np.asarray(maps[1]).max() > 0.99


def test_argmax_decode_roundtrip():
    kp = jnp.asarray([[12.0, 7.0], [40.0, 33.0]])
    maps = gaussian_heatmaps(kp, (64, 48), sigma=2.0, add_background=True)
    got = keypoints_from_heatmaps(maps[None], has_background=True)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(kp), atol=0.5)


def test_downsample_average_pools():
    kp = jnp.asarray([[16.0, 16.0]])
    maps = gaussian_heatmaps(kp, (32, 32), add_background=False)
    small = downsample_heatmaps(maps, 4)
    assert small.shape == (1, 8, 8)
    np.testing.assert_allclose(
        np.asarray(small).sum(), np.asarray(maps).sum() / 16.0, rtol=1e-5)
