"""Video writer: denormalize predictions onto reference-skeleton screen space,
render through the selected renderers, tile into a grid and write mp4s
(reference ``loggers/pedestrian/pedestrian_writer.py:27-372``; mp4 via cv2
instead of torchvision.io)."""
import os
from typing import Iterable, List, Optional

import numpy as np

from ..ops.reference_skeletons import denormalize_from_projection
from ..renderers.points_renderer import PointsRenderer
from ..renderers.renderer import ZerosRenderer
from ..skeletons.carla import CARLA_SKELETON

DEFAULT_RENDERERS = ("input_points", "projection_points")


class PedestrianWriter:
    def __init__(self, log_dir: str,
                 renderers: Iterable[str] = DEFAULT_RENDERERS,
                 input_nodes=CARLA_SKELETON, output_nodes=CARLA_SKELETON,
                 fps: float = 30.0, max_videos: int = 4,
                 video_saving_frequency_reduction: int = 10,
                 log_every_n_steps: int = 50, merging_method: str = "square",
                 source_videos_dir=None, overlay_skeletons: bool = True,
                 overlay_bboxes: bool = True, overlay_classes: bool = False,
                 **kwargs):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self.renderers = [r for r in renderers if r and r != "none"]
        self.fps = fps
        self.max_videos = max_videos
        self.merging_method = merging_method
        self._throttle = max(1, log_every_n_steps
                             * video_saving_frequency_reduction)
        self.input_nodes = input_nodes
        self.output_nodes = output_nodes
        self.source_videos_dir = source_videos_dir
        self.overlay_skeletons = overlay_skeletons
        self.overlay_bboxes = overlay_bboxes
        self.overlay_classes = overlay_classes
        self._input_renderer = PointsRenderer(input_nodes)
        self._output_renderer = PointsRenderer(output_nodes)
        self._zeros = ZerosRenderer()

    def _denormalize(self, frames: Optional[np.ndarray],
                     age_gender_idx: np.ndarray,
                     normalized: bool) -> Optional[np.ndarray]:
        if frames is None:
            return None
        frames = np.asarray(frames)[..., :2]
        if not normalized:
            return frames
        import jax.numpy as jnp
        return np.asarray(denormalize_from_projection(
            jnp.asarray(frames), jnp.asarray(age_gender_idx)))

    def _render(self, name: str, inputs, targets, projections, meta,
                normalized: bool):
        agi = meta.get("age_gender_idx",
                       np.zeros(len(inputs), dtype=np.int32))
        if name == "zeros":
            return list(self._zeros.render(frames=inputs))
        if name == "source_carla":
            # live-CARLA render of the SOURCE (ground-truth) pose — the
            # reference's source_carla renderer (pedestrian_writer.py:102-104
            # + carla_renderer.py); degrades to points rendering of the
            # inputs when no relative-pose targets exist (synthetic 2D-only
            # data) and to black frames under the mock client
            if targets.get("relative_pose_rot") is not None:
                try:
                    from ..renderers.carla_renderer import CarlaRenderer
                    return list(CarlaRenderer().render(
                        relative_pose_loc=targets.get("relative_pose_loc"),
                        relative_pose_rot=targets.get("relative_pose_rot"),
                        world_loc=targets.get("world_loc"),
                        world_rot=targets.get("world_rot"), meta=meta))
                except Exception:
                    pass
            pts = self._denormalize(inputs, agi, normalized)
            return list(self._input_renderer.render(pts))
        if name == "input_points":
            pts = self._denormalize(inputs, agi, normalized)
            return list(self._input_renderer.render(pts))
        if name == "target_points":
            pts = self._denormalize(targets.get("projection_2d"), agi, False)
            return list(self._input_renderer.render(pts)) \
                if pts is not None else list(self._zeros.render(frames=inputs))
        if name in ("projection_points", "carla"):
            if name == "carla":
                try:
                    from ..renderers.carla_renderer import CarlaRenderer
                    return list(CarlaRenderer().render(
                        relative_pose_loc=targets.get("relative_pose_loc"),
                        relative_pose_rot=projections.get(
                            "relative_pose_rot"),
                        world_loc=projections.get("world_loc"),
                        world_rot=projections.get("world_rot"), meta=meta))
                except Exception:
                    pass
            pts = self._denormalize(
                projections.get("projection_2d_transformed",
                                projections.get("projection_2d")),
                agi, normalized="projection_2d_transformed" in projections)
            return list(self._output_renderer.render(pts)) \
                if pts is not None else list(self._zeros.render(frames=inputs))
        if name == "smpl":
            from ..renderers.smpl_renderer import SMPLRenderer
            return list(SMPLRenderer().render(
                amass_body_pose=targets.get("amass_body_pose"),
                projection_2d=targets.get("projection_2d"),
                meta=meta))
        if name == "source_videos":
            from ..renderers.source_videos_renderer import \
                SourceVideosRenderer
            out_pts = self._denormalize(
                projections.get("projection_2d_transformed",
                                projections.get("projection_2d")),
                agi, normalized="projection_2d_transformed" in projections)
            rendered = list(SourceVideosRenderer(
                source_videos_dir=self.source_videos_dir,
                input_nodes=self.input_nodes,
                output_nodes=self.output_nodes,
                overlay_skeletons=self.overlay_skeletons,
                overlay_bboxes=self.overlay_bboxes,
                overlay_classes=self.overlay_classes).render(
                meta=meta, targets=targets,
                input_points=targets.get("projection_2d"),
                output_points=out_pts))
            if rendered:
                # native video resolution -> writer canvas so _merge can tile
                import cv2
                w, h = self._input_renderer.image_size
                return [np.stack([cv2.resize(f, (w, h)) for f in clip])
                        for clip in rendered]
        return list(self._zeros.render(frames=inputs))

    def _merge(self, videos: List[np.ndarray]) -> np.ndarray:
        """Tile renderer outputs (reference
        ``pedestrian_writer.py:276-289``)."""
        if len(videos) == 1:
            return videos[0]
        if self.merging_method == "vertical":
            return np.concatenate(videos, axis=1)
        if self.merging_method == "horizontal":
            return np.concatenate(videos, axis=2)
        # square-ish grid
        n = len(videos)
        cols = int(np.ceil(np.sqrt(n)))
        rows = int(np.ceil(n / cols))
        blank = np.zeros_like(videos[0])
        padded = videos + [blank] * (rows * cols - n)
        return np.concatenate([
            np.concatenate(padded[r * cols:(r + 1) * cols], axis=2)
            for r in range(rows)], axis=1)

    def _write_mp4(self, path: str, video: np.ndarray) -> None:
        import cv2
        h, w = video.shape[1:3]
        writer = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"),
                                 self.fps, (w, h))
        for frame in video:
            writer.write(frame[..., ::-1])  # RGB -> BGR
        writer.release()

    def should_log(self, step: int) -> bool:
        """True when the training-time throttle admits this step (reference
        ``pedestrian_writer.py:140-141``) — lets callers skip the extra
        forward pass that produces the projections to render."""
        return bool(self.renderers) and step % self._throttle == 0

    def log_videos(self, inputs, targets, projections, meta,
                   step: int = 0, batch_idx: int = 0, stage: str = "train",
                   normalized: bool = True, force: bool = False,
                   vid_callback=None) -> List[str]:
        """Render up to ``max_videos`` clips; throttled unless forced
        (reference ``pedestrian_writer.py:123-171``)."""
        if not self.renderers:
            return []
        if not force and step % self._throttle != 0:
            return []
        sel = slice(0, self.max_videos)
        inputs = np.asarray(inputs)[sel]
        targets = {k: np.asarray(v)[sel] for k, v in targets.items()
                   if hasattr(v, "__len__")}
        projections = {k: np.asarray(v)[sel] for k, v in projections.items()
                       if v is not None and hasattr(v, "__len__")}
        meta = {k: np.asarray(v)[sel] for k, v in meta.items()
                if hasattr(v, "__len__")}

        per_renderer = [self._render(r, inputs, targets, projections, meta,
                                     normalized) for r in self.renderers]
        paths = []
        for clip_idx in range(len(inputs)):
            merged = self._merge([pr[clip_idx] for pr in per_renderer])
            name = f"{stage}-step={step:0>6d}-batch={batch_idx:0>4d}" \
                   f"-clip={clip_idx:0>2d}.mp4"
            path = os.path.join(self.log_dir, name)
            self._write_mp4(path, merged)
            paths.append(path)
            if vid_callback is not None:
                vid_callback(merged, clip_idx, self.fps, stage, meta)
        return paths
