"""Heatmap utilities: gaussian rendering + argmax keypoint decoding (reference
``utils/gaussian_kernel.py:5-14``, ``modules/flow/pose_estimation.py:96-134``,
``data/base/mixins/dataset/video_mixin.py:186-225``)."""
from typing import Tuple

import jax.numpy as jnp
import numpy as np


def gaussian_heatmaps(keypoints: jnp.ndarray, image_size: Tuple[int, int],
                      sigma: float = 3.0,
                      add_background: bool = True) -> jnp.ndarray:
    """Per-joint gaussian heatmaps.

    :param keypoints: (..., J, 2) pixel coordinates (x, y); (0, 0) = missing.
    :param image_size: (width, height) of the heatmap canvas.
    :return: (..., J(+1), H, W); the optional last channel is the background
        (1 - max over joints), matching the reference's convention.
    """
    w, h = image_size
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    kx = keypoints[..., 0][..., None, None]
    ky = keypoints[..., 1][..., None, None]
    d2 = (xs - kx) ** 2 + (ys - ky) ** 2
    maps = jnp.exp(-d2 / (2.0 * sigma ** 2))
    # reference ``gaussian_kernel.py`` clips the tails: gmap[gmap < 0.0099] = 0
    maps = jnp.where(maps < 0.0099, 0.0, maps)
    missing = jnp.all(keypoints == 0, axis=-1)[..., None, None]
    maps = jnp.where(missing, 0.0, maps)
    if add_background:
        bg = 1.0 - jnp.max(maps, axis=-3, keepdims=True)
        maps = jnp.concatenate([maps, bg], axis=-3)
    return maps


def keypoints_from_heatmaps(heatmaps: jnp.ndarray,
                            has_background: bool = True) -> jnp.ndarray:
    """Argmax decode: (..., J(+1), H, W) -> (..., J, 2) pixel (x, y)
    (reference ``pose_estimation.py:113-134`` ``_keypoints_from_heatmaps``)."""
    if has_background:
        heatmaps = heatmaps[..., :-1, :, :]
    h, w = heatmaps.shape[-2:]
    flat = heatmaps.reshape(heatmaps.shape[:-2] + (h * w,))
    idx = jnp.argmax(flat, axis=-1)
    ys = (idx // w).astype(jnp.float32)
    xs = (idx % w).astype(jnp.float32)
    return jnp.stack([xs, ys], axis=-1)


def downsample_heatmaps(heatmaps: jnp.ndarray, factor: int) -> jnp.ndarray:
    """Average-pool GT heatmaps down to the model's output resolution
    (reference ``pose_estimation.py:96-107``)."""
    *lead, c, h, w = heatmaps.shape
    x = heatmaps.reshape(-1, c, h // factor, factor, w // factor, factor)
    return x.mean(axis=(-3, -1)).reshape(*lead, c, h // factor, w // factor)
