"""CARLA-BSP recorded dataset (reference
``data/carla/datamodules/carla_recorded_datamodule.py:28-179`` + the benchmark
variant ``carla_benchmark_datamodule.py:9-42``): ``data.csv`` with stringified
per-frame lists (camera transform, pose.{world,component,relative,camera}),
parsed, windowed into clips, filtered to fully-in-frame pedestrians, targets =
bboxes + pose loc/rot in the reference's convention (last-3 columns = euler
radians -> "XYZ" matrices, *without* the CARLA->P3D negation — upstream parity).
"""
import ast
import os
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

from ...ops.rotations import euler_angles_to_matrix_np
from ...skeletons.carla import CARLA_SKELETON
from ..base.classification_mixin import (BenchmarkDataModuleMixin,
                                         ClassificationDataModuleMixin)
from ..base.video_mixin import VideoDataModuleMixin
from ..base.hdf5_datamodule import Hdf5DataModule
from ..base.pandas_mixin import PandasDataModuleMixin

CARLA_RECORDED_DEFAULT_SET_NAME = "default"


def convert_to_list(x):
    try:
        return ast.literal_eval(x.replace("nan", '"nan"'))
    except ValueError:
        return str(x)


def _np_bboxes(projection_2d: np.ndarray, near_zero=1e-5) -> np.ndarray:
    missing = np.all(projection_2d[..., :2] < near_zero, axis=-1,
                     keepdims=True)
    mins = np.min(np.where(missing, np.inf, projection_2d), axis=-2)
    maxs = np.max(np.where(missing, -np.inf, projection_2d), axis=-2)
    return np.stack([mins, maxs], axis=-2).astype(np.float32)


class CarlaRecordedDataModule(ClassificationDataModuleMixin,
                              PandasDataModuleMixin, Hdf5DataModule):
    default_data_nodes = CARLA_SKELETON
    def __init__(self,
                 data_variant: str = CARLA_RECORDED_DEFAULT_SET_NAME,
                 source_videos_dir: str = None,
                 datasets_dir: str = "datasets/CARLA",
                 **kwargs):
        self.data_variant = data_variant
        source_videos_dir = source_videos_dir or os.path.join(
            datasets_dir, data_variant)
        kwargs.setdefault("classification_targets_key",
                          "frame.pedestrian.is_crossing")
        kwargs.setdefault("data_nodes", CARLA_SKELETON)
        super().__init__(
            data_filepath=os.path.join(source_videos_dir, "data.csv"),
            video_index=["id", "camera.idx"],
            pedestrian_index=["pedestrian.idx"],
            clips_index=["clip", "frame.idx"],
            converters={c: convert_to_list for c in (
                "camera.transform", "pedestrian.spawn_point",
                "frame.pedestrian.transform", "frame.pedestrian.velocity",
                "frame.pedestrian.pose.world",
                "frame.pedestrian.pose.component",
                "frame.pedestrian.pose.relative",
                "frame.pedestrian.pose.camera")},
            **kwargs)
        self.source_videos_dir = source_videos_dir

    @property
    def settings(self):
        return {**super().settings, "data_variant": self.data_variant}

    def _read_data(self):
        df = pd.read_csv(self.data_filepath,
                         index_col=self.primary_index,
                         converters=self.converters)
        return df

    def _clean_filter_sort_data(self, df: pd.DataFrame) -> pd.DataFrame:
        if "camera.recording" in df.columns:
            df = df.assign(**{"camera.recording": df["camera.recording"]
                              .str.replace(".mp4", "", regex=False)})
        return super()._clean_filter_sort_data(df)

    # clip windowing comes from PandasDataModuleMixin._extract_clips
    # (clips_index[-1] == "frame.idx" here) — keeping a local copy in sync
    # proved error-prone, so there is none

    def _clean_filter_sort_clips(self, clips: List[pd.DataFrame]):
        return [c for c in clips if self._has_pedestrian_in_all_frames(c)]

    def _has_pedestrian_in_all_frames(self, clip: pd.DataFrame) -> bool:
        first = clip.iloc[0]
        w = first.get("camera.width", 800)
        h = first.get("camera.height", 600)
        projection_2d = np.array(
            clip.loc[:, "frame.pedestrian.pose.camera"].to_list(),
            dtype=np.float32)
        return bool(np.all(projection_2d >= 0)
                    and np.all(projection_2d[..., 0] <= w)
                    and np.all(projection_2d[..., 1] <= h))

    def _extract_transform(self, grouped, column: str):
        t = self._reshape_to_sequences(grouped, column)
        loc = t[..., :3]
        rot = euler_angles_to_matrix_np(np.deg2rad(t[..., 3:]), "XYZ")
        return loc.astype(np.float32), rot.astype(np.float32)

    def _get_raw_data(self, grouped) -> Tuple[np.ndarray, Dict, Dict]:
        projection_2d = self._reshape_to_sequences(
            grouped, "frame.pedestrian.pose.camera")

        rel_loc, rel_rot = self._extract_transform(
            grouped, "frame.pedestrian.pose.relative")
        abs_loc, abs_rot = self._extract_transform(
            grouped, "frame.pedestrian.pose.component")
        world_pose_loc, world_pose_rot = self._extract_transform(
            grouped, "frame.pedestrian.pose.world")
        world_loc, world_rot = self._extract_transform(
            grouped, "frame.pedestrian.transform")
        velocity = self._reshape_to_sequences(grouped,
                                              "frame.pedestrian.velocity")

        targets = {
            "bboxes": _np_bboxes(projection_2d),
            "relative_pose_loc": rel_loc, "relative_pose_rot": rel_rot,
            "absolute_pose_loc": abs_loc, "absolute_pose_rot": abs_rot,
            "world_pose_loc": world_pose_loc,
            "world_pose_rot": world_pose_rot,
            "world_loc": world_loc, "world_rot": world_rot,
            "velocity": velocity,
        }

        head = grouped.head(1).reset_index(drop=False)
        tail = grouped.tail(1).reset_index(drop=False)
        meta = {
            "video_id": tail.loc[:, "camera.recording"].to_list()
            if "camera.recording" in tail.columns
            else tail.loc[:, "id"].astype(str).to_list(),
            "pedestrian_id": tail.loc[:, ["camera.idx", "pedestrian.idx"]]
            .apply(lambda x: "_".join(str(y) for y in x), axis=1).to_list(),
            "clip_id": tail.loc[:, "clip"].to_numpy().astype(np.int32),
            "age": tail.loc[:, "pedestrian.age"].to_list(),
            "gender": tail.loc[:, "pedestrian.gender"].to_list(),
            "start_frame": head.loc[:, "frame.idx"].to_numpy()
            .astype(np.int32),
            "end_frame": tail.loc[:, "frame.idx"].to_numpy()
            .astype(np.int32) + 1,
            "clip_width": head.get(
                "camera.width", pd.Series([800] * len(head)))
            .to_numpy().astype(np.int32),
            "clip_height": head.get(
                "camera.height", pd.Series([600] * len(head)))
            .to_numpy().astype(np.int32),
        }
        self._add_classification_to_meta(grouped, tail, meta)
        return projection_2d, targets, meta


class CarlaBenchmarkDataModule(BenchmarkDataModuleMixin,
                               CarlaRecordedDataModule):
    """Adds crossing_point/crossing columns from frame.pedestrian.is_crossing
    (reference ``carla_benchmark_datamodule.py:9-42``)."""

    def __init__(self, **kwargs):
        kwargs.setdefault("classification_targets_key", "crossing")
        super().__init__(**kwargs)

    def _clean_filter_sort_data(self, df: pd.DataFrame) -> pd.DataFrame:
        df = super()._clean_filter_sort_data(df)
        # derive per-video crossing_point (first crossing frame) + crossing
        if "frame.pedestrian.is_crossing" in df.columns:
            def per_video(group):
                crossing_frames = group.loc[
                    group["frame.pedestrian.is_crossing"].astype(bool),
                    "frame.idx"]
                cp = int(crossing_frames.min()) if len(crossing_frames) \
                    else -1
                group = group.assign(crossing_point=cp,
                                     crossing=cp >= 0)
                return group
            df = df.groupby(level=list(range(len(self.primary_index))),
                            group_keys=False).apply(per_video)
        return df


class CarlaRecordedVideoDataModule(VideoDataModuleMixin,
                                   CarlaRecordedDataModule):
    """CarlaRecorded with decoded video-frame inputs (reference
    ``carla_recorded_video_datamodule.py:8-19``)."""
