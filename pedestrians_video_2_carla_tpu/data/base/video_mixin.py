"""Video input pipeline: replace 2D-pose inputs with decoded video frames
(reference ``data/base/mixins/dataset/video_mixin.py:17-238``: pims/PyAV decode,
bbox-square crop, VideoToResNet equalize+resize+normalize, optional per-joint
gaussian heatmap targets + background channel). cv2-based here; decoding stays
host-side, normalization is vectorized numpy."""
import os
from typing import Iterator, Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


def read_clip_frames(video_path: str, start_frame: int, end_frame: int
                     ) -> Optional[np.ndarray]:
    """Decode frames [start, end) -> (L, H, W, 3) uint8 RGB, None on failure."""
    import cv2
    cap = cv2.VideoCapture(video_path)
    if not cap.isOpened():
        return None
    cap.set(cv2.CAP_PROP_POS_FRAMES, start_frame)
    frames = []
    for _ in range(end_frame - start_frame):
        ok, frame = cap.read()
        if not ok:
            break
        frames.append(frame[..., ::-1])  # BGR -> RGB
    cap.release()
    if len(frames) != end_frame - start_frame:
        return None
    return np.stack(frames)


def crop_rect(frame_hw: Tuple[int, int], bbox: np.ndarray,
              margin: float = 0.2) -> Tuple[int, int, int, int]:
    """Square crop region around the clip bbox (reference
    ``video_mixin.py:144-184``) as ``(x1, y1, x2, y2)``; degenerate bboxes
    fall back to the full frame."""
    h, w = frame_hw
    x1, y1 = bbox.reshape(-1, 2).min(axis=0)
    x2, y2 = bbox.reshape(-1, 2).max(axis=0)
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    half = max(x2 - x1, y2 - y1) * (1 + margin) / 2
    x1c = int(max(0, cx - half))
    y1c = int(max(0, cy - half))
    x2c = int(min(w, cx + half))
    y2c = int(min(h, cy + half))
    if x2c <= x1c or y2c <= y1c:
        return 0, 0, w, h
    return x1c, y1c, x2c, y2c


def square_crop(frames: np.ndarray, bbox: np.ndarray,
                margin: float = 0.2) -> np.ndarray:
    """Crop a square region around the clip bbox."""
    x1c, y1c, x2c, y2c = crop_rect(frames.shape[1:3], bbox, margin)
    return frames[:, y1c:y2c, x1c:x2c]


def to_model_frames(frames: np.ndarray,
                    target_size: Tuple[int, int] = (256, 256)) -> np.ndarray:
    """uint8 (L, H, W, 3) -> normalized float32 (L, th, tw, 3)."""
    import cv2
    th, tw = target_size
    resized = np.stack([cv2.resize(f, (tw, th)) for f in frames])
    out = resized.astype(np.float32) / 255.0
    return (out - IMAGENET_MEAN) / IMAGENET_STD


class VideoDataModuleMixin:
    """Wraps a datamodule's batch iterators to emit decoded video frames as
    inputs (and keep the 2D keypoints as targets)."""

    def __init__(self, source_videos_dir: Optional[str] = None,
                 video_size: Tuple[int, int] = (256, 256),
                 crop_to_bbox: bool = True,
                 needs_heatmaps: bool = False,
                 heatmaps_sigma: float = 3.0,
                 heatmaps_stride: int = 8,
                 **kwargs):
        # forward source_videos_dir: the wrapped datamodule uses it too
        # (CarlaRecorded locates data.csv in it) — consuming it here would
        # silently point the CSV at the default location while decoding
        # videos from the user's directory
        if source_videos_dir is not None:
            kwargs["source_videos_dir"] = source_videos_dir
        super().__init__(**kwargs)
        self.source_videos_dir = source_videos_dir \
            or getattr(self, "source_videos_dir", None)
        self.video_size = video_size
        self.crop_to_bbox = crop_to_bbox
        self.needs_heatmaps = needs_heatmaps
        self.heatmaps_sigma = heatmaps_sigma
        self.heatmaps_stride = heatmaps_stride
        #: the base iterator must keep string meta (video_id) so frames can
        #: be decoded host-side; it is stripped again before yielding
        self._keep_string_meta = True

    def _video_path(self, video_id: str) -> str:
        # CarlaRecorded's camera.recording already carries the extension;
        # JAAD-style ids do not
        name = video_id if video_id.lower().endswith(
            (".mp4", ".avi", ".mov", ".mkv")) else f"{video_id}.mp4"
        return os.path.join(self.source_videos_dir, name)

    def _with_video_inputs(self, batches: Iterator) -> Iterator:
        import warnings

        for inputs, targets, meta in batches:
            clips = []
            # per-clip frame-pixel -> model-frame transform: the same crop +
            # resize applied to the pixels must be applied to the keypoint
            # targets, otherwise heatmap peaks land off the pedestrian
            kp_offset = []
            kp_scale = []
            dropped = None
            B = len(np.asarray(inputs))
            for i in range(B):
                video_id = str(np.asarray(meta.get(
                    "video_id", ["unknown"] * B))[i]) \
                    if "video_id" in meta else None
                start = int(np.asarray(meta.get("start_frame",
                                                np.zeros(B)))[i])
                end = int(np.asarray(meta.get(
                    "end_frame", np.full(B, self.clip_length)))[i])
                frames = read_clip_frames(self._video_path(video_id),
                                          start, end) \
                    if video_id is not None else None
                if frames is None:
                    dropped = self._video_path(video_id) \
                        if video_id is not None else "<no video_id in meta>"
                    break
                if self.crop_to_bbox and "bboxes" in targets:
                    x1c, y1c, x2c, y2c = crop_rect(
                        frames.shape[1:3], np.asarray(targets["bboxes"])[i])
                    frames = frames[:, y1c:y2c, x1c:x2c]
                else:
                    x1c, y1c = 0, 0
                    y2c, x2c = frames.shape[1:3]
                kp_offset.append((x1c, y1c))
                kp_scale.append((1.0 / (x2c - x1c), 1.0 / (y2c - y1c)))
                clips.append(to_model_frames(frames, self.video_size))
            if dropped is not None:
                warnings.warn(
                    f"dropping a whole batch of {B} clips: failed to decode "
                    f"{dropped!r} — check --source_videos_dir")
                continue
            video_inputs = np.stack(clips)
            new_targets = dict(targets)
            if self.needs_heatmaps:
                from ...ops.heatmaps import gaussian_heatmaps
                import jax.numpy as jnp
                w = self.video_size[1] // self.heatmaps_stride
                h = self.video_size[0] // self.heatmaps_stride
                # frame-pixel keypoints through the per-clip crop, then into
                # the heatmap canvas
                kp = np.asarray(targets["projection_2d"], np.float32)
                off = np.asarray(kp_offset, np.float32)[:, None, None, :]
                sc = np.asarray(kp_scale, np.float32)[:, None, None, :] \
                    * np.asarray([w, h], np.float32)
                hm = np.asarray(gaussian_heatmaps(
                    jnp.asarray((kp - off) * sc), (w, h),
                    self.heatmaps_sigma))
                new_targets["heatmaps"] = hm
            # strip string meta again: only numeric meta may reach the device
            numeric_meta = {k: v for k, v in meta.items()
                            if isinstance(v, np.ndarray)
                            and v.dtype.kind in "biuf"}
            yield video_inputs, new_targets, numeric_meta

    def train_batches(self, seed: int = 0):
        return self._with_video_inputs(super().train_batches(seed))

    def val_batches(self):
        return self._with_video_inputs(super().val_batches())

    def test_batches(self):
        return self._with_video_inputs(super().test_batches())

    def predict_batches(self, set_name: str):
        # _keep_string_meta makes the base iterator emit string video_ids;
        # route predict through the same wrapper so they are consumed (frames
        # decoded) and stripped before Trainer.predict's jitted eval step
        return self._with_video_inputs(super().predict_batches(set_name))
