"""Heatmap debugging visualizer (reference ``utils/visualize_heatmaps.py``:
one frame + its per-joint heatmaps blended on top, stacked vertically and
written to a PNG). Uses cv2's jet colormap instead of matplotlib."""
import os
from typing import Optional

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def visualize_heatmaps(clip_frames: np.ndarray,
                       clip_heatmaps: np.ndarray,
                       clip_idx: int = 0,
                       frame_idx: int = 0,
                       output_path: Optional[str] = None) -> np.ndarray:
    """Blend every heatmap channel over the (de-ImageNet-normalized) frame.

    :param clip_frames: (B, T, C, H, W) normalized frames.
    :param clip_heatmaps: (B, T, P, H, W) heatmaps; channel 0 = background
        (moved to the end of the strip, matching the reference).
    :return: (P+1)*H x W x 3 uint8 strip; written to ``output_path`` if set.
    """
    import cv2

    frame = np.asarray(clip_frames)[clip_idx, frame_idx]
    heatmaps = np.asarray(clip_heatmaps)[clip_idx, frame_idx]

    rgb = np.clip((frame.transpose(1, 2, 0) * IMAGENET_STD + IMAGENET_MEAN)
                  * 255.0, 0, 255).astype(np.uint8)
    h, w = rgb.shape[:2]

    images = [rgb]
    order = list(range(1, heatmaps.shape[0])) + [0]  # background last
    for p in order:
        heat = np.clip(heatmaps[p], 0.0, 1.0)
        if heat.shape != (h, w):
            heat = cv2.resize(heat, (w, h))
        colored = cv2.applyColorMap((heat * 255).astype(np.uint8),
                                    cv2.COLORMAP_JET)[..., ::-1]
        images.append((0.2 * rgb + 0.8 * colored).astype(np.uint8))

    strip = np.concatenate(images, axis=0)
    if output_path:
        os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
        cv2.imwrite(output_path, strip[..., ::-1])
    return strip
