"""JAADUniPose: extract keypoints with the UniPose-LSTM model instead of
OpenPose JSONs (reference ``data/unipose/jaad_unipose_datamodule.py:21-33``,
documented there as experimental with poor keypoint quality — kept for
capability parity). Runs the flax UniPoseLSTM over decoded clip crops and
argmax-decodes heatmaps into BODY_25-slot keypoints."""
import os
from typing import List

import numpy as np

from ..base.video_mixin import crop_rect, read_clip_frames, to_model_frames
from ..openpose.datamodules import JAADOpenPoseDataModule


class JAADUniPoseDataModule(JAADOpenPoseDataModule):
    def __init__(self, unipose_params=None, video_size=(256, 256), **kwargs):
        super().__init__(**kwargs)
        self._unipose_params = unipose_params
        self._video_size = video_size
        self._model = None

    def _ensure_model(self):
        if self._model is None:
            import jax

            from ...models.pose_estimation.unipose_lstm import UniPoseLSTM
            self._model = UniPoseLSTM(backbone="resnet50",
                                      output_nodes=self.data_nodes)
            if self._unipose_params is None:
                import jax.numpy as jnp
                dummy = jnp.zeros((1, 1) + tuple(self._video_size) + (3,))
                self._unipose_params = self._model.init(
                    {"params": jax.random.PRNGKey(0)}, dummy, training=False)
        return self._model

    def _extract_additional_data(self, clips: List):
        from ...ops.heatmaps import keypoints_from_heatmaps
        import jax.numpy as jnp

        model = self._ensure_model()
        videos_dir = os.path.join(self.datasets_dir, "JAAD", "videos")
        updated = []
        for clip in clips:
            info = clip.reset_index(drop=True).sort_values("frame")
            video_id = info.iloc[0]["video"]
            start = int(info.iloc[0]["frame"])
            end = int(info.iloc[-1]["frame"]) + 1
            frames = read_clip_frames(
                os.path.join(videos_dir, f"{video_id}.mp4"), start, end)
            if frames is None:
                continue
            bbox = info.iloc[0][["x1", "y1", "x2", "y2"]].to_numpy() \
                .astype(np.float32)
            x1c, y1c, x2c, y2c = crop_rect(frames.shape[1:3], bbox)
            crop = frames[:, y1c:y2c, x1c:x2c]
            model_in = to_model_frames(crop, self._video_size)[None]
            heatmaps = model.apply(self._unipose_params,
                                   jnp.asarray(model_in), training=False)
            kp = np.asarray(keypoints_from_heatmaps(heatmaps))[0]  # (L, J, 2)
            # heatmap-canvas coords -> crop pixels -> FRAME pixels, so the
            # stored keypoints share the bbox/clip_width coordinate space of
            # the OpenPose pipeline that consumes them
            hm_h, hm_w = np.asarray(heatmaps).shape[-2:]
            kp = kp * np.asarray([(x2c - x1c) / hm_w,
                                  (y2c - y1c) / hm_h], np.float32) \
                + np.asarray([x1c, y1c], np.float32)
            for i in range(len(info)):
                pts = np.concatenate(
                    [kp[i], np.ones((len(kp[i]), 1), np.float32)], axis=-1)
                info.at[info.index[i], "keypoints"] = pts.tolist()
            updated.append(info)
        return updated
