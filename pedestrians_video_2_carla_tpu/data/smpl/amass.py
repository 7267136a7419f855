"""AMASS mocap datamodule (reference ``data/smpl/amass_datamodule.py:22-277``):
``.npz`` mocaps -> 60->30 fps decimation -> naive yaw-only root-orientation
recovery -> SMPL joints (body model or zero-length-bone FK fallback) ->
conventions rotation -> 2D projection ground truth.
"""
import glob
import os
from typing import Dict, Iterable, List, Tuple

import numpy as np
import pandas as pd

from ...ops import camera as C
from ...ops.kinematics import forward_kinematics
from ...ops.rotations import euler_angles_to_matrix_np
from ...skeletons.smpl import SMPL_SKELETON, map_from_original
from ..base.hdf5_datamodule import Hdf5DataModule
from ..base.pandas_mixin import PandasDataModuleMixin
from .body_model import get_body_model, joint_locations

AMASS_DIR = "AMASS"

#: SMPL -> P3D world conventions rotation (reference
#: ``data/smpl/utils.py:52-58``)
CONVENTIONS_ROT = np.asarray([
    (1.0, 0.0, 0.0),
    (0.0, 0.0, -1.0),
    (0.0, 1.0, 0.0),
], dtype=np.float32)

#: SMPL kinematic tree in the re-indexed SMPL_SKELETON order
SMPL_PARENTS = (-1, 0, 1, 2, 3, 4, 5, 6, 3, 8, 3, 10, 11, 12, 0, 14, 15, 16,
                0, 18, 19, 20)


class AMASSDataModule(PandasDataModuleMixin, Hdf5DataModule):
    default_data_nodes = SMPL_SKELETON
    def __init__(self, datasets_dir: str = "datasets",
                 use_body_model: bool = True, **kwargs):
        kwargs.setdefault("data_nodes", SMPL_SKELETON)
        self.datasets_dir = datasets_dir
        self.use_body_model = use_body_model
        self.available_datasets: List[str] = []
        super().__init__(
            data_filepath=None,
            video_index=["dataset", "id"],
            pedestrian_index=[],
            clips_index=["clip", "frame"],
            **kwargs)
        self.amass_dir = os.path.join(datasets_dir, AMASS_DIR)

    @property
    def settings(self):
        return {**super().settings, "datasets": self.available_datasets}

    def _read_data(self) -> pd.DataFrame:
        mocaps = []
        base_len = len(self.amass_dir) + 1
        for path in glob.glob(os.path.join(self.amass_dir, "**", "*.npz"),
                              recursive=True):
            with np.load(path, mmap_mode="r") as mocap:
                if "poses" not in mocap:
                    continue
                rel = path[base_len:]
                mocaps.append({
                    "dataset": rel.split(os.path.sep)[0],
                    # NOT rstrip(".npz"): that strips any trailing n/p/z/.
                    # characters and would collide e.g. run.npz with ru.npz
                    "id": rel.split(os.path.sep, 1)[-1].removesuffix(".npz"),
                    "poses": np.asarray(mocap["poses"]),
                    "gender": str(mocap["gender"]) if "gender" in mocap
                    else "neutral",
                    "age": str(mocap["age"]) if "age" in mocap else "adult",
                })
        df = pd.DataFrame(mocaps)
        if len(df):
            self.available_datasets = sorted(df["dataset"].unique())
        return df

    def _clean_filter_sort_data(self, df):
        return df  # no CSV index here

    # -- clip assembly -----------------------------------------------------
    def _extract_clips(self, mocaps: pd.DataFrame) -> Iterable[pd.DataFrame]:
        clips = []
        fps_ratio = 2  # AMASS 60fps -> 30fps
        amass_offset = self.clip_offset * fps_ratio
        amass_length = self.clip_length * fps_ratio
        smpl_len = len(SMPL_SKELETON)
        for _, mocap in mocaps.iterrows():
            end = mocap["poses"].shape[0] - amass_length - fps_ratio + 1
            clip_idx = 0
            for start in range(0, max(end, 0), amass_offset):
                pose = np.asarray(
                    mocap["poses"][start:start + amass_length:fps_ratio,
                                   :smpl_len * 3], dtype=np.float32)
                root_orient, world_rot = self._root_orient_and_world_rot(pose)
                pose = pose.copy()
                pose[:, 0:3] = root_orient
                frames = pd.DataFrame({
                    "dataset": str(mocap["dataset"]),
                    "id": str(mocap["id"]),
                    "clip": clip_idx,
                    "gender": str(mocap["gender"]),
                    "age": str(mocap["age"]),
                    "frame": list(range(len(pose))),
                })
                frames["world_rot"] = [world_rot[i] for i in range(len(pose))]
                frames["amass_body_pose"] = [pose[i] for i in range(len(pose))]
                clips.append(frames)
                clip_idx += 1
                if self._fast_dev_run:
                    break
        return clips

    def _root_orient_and_world_rot(self, body_pose: np.ndarray):
        """Yaw-only root-orientation recovery (reference
        ``amass_datamodule.py:204-235``): snap the mean orientation to the
        nearest canonical axis rotation, keep only yaw, re-zero to the first
        frame; the recovered yaw track becomes the world rotation."""
        axes = body_pose[:, 0:3] * 2.0 / np.pi
        axes_rot = np.round(euler_angles_to_matrix_np(
            np.round(axes.mean(axis=0)) * np.pi / 2.0, "XYZ"))
        root = (axes_rot @ body_pose[:, 0:3].T).T
        yaw = root.copy()
        yaw[:, 0] = 0.0
        yaw[:, 1] = 0.0
        yaw_mtx = euler_angles_to_matrix_np(yaw, "XYZ")
        world_rot = (yaw_mtx[0].T @ yaw_mtx).astype(np.float32)
        return np.zeros_like(root), world_rot

    # -- projections -------------------------------------------------------
    def _extract_additional_data(self, clips):
        import jax.numpy as jnp

        cam = C.make_camera(distance=3.1, shift=0.0, elevation=0.0,
                            look_at=(0.0, 0.0, 0.0))
        updated = []
        for clip in clips:
            info = clip.iloc[0]
            pose = np.stack(clip["amass_body_pose"].to_list())
            world_rot = np.stack(clip["world_rot"].to_list())
            L = len(pose)
            smpl_len = len(SMPL_SKELETON)

            # relative rotations: reference treats the axis-angle triplets as
            # XYZ eulers for this output (data/smpl/utils.py:96-105)
            rel_rot = euler_angles_to_matrix_np(map_from_original(
                pose.reshape(L, smpl_len, 3)), "XYZ").astype(np.float32)

            abs_loc = self._absolute_joints(info["gender"], pose)
            abs_loc = (abs_loc @ CONVENTIONS_ROT).astype(np.float32)

            rel_loc = np.zeros((L, smpl_len, 3), np.float32)
            _, abs_rot = forward_kinematics(rel_loc, rel_rot,
                                            parents=SMPL_PARENTS)
            abs_rot = np.asarray(abs_rot)

            projections = np.asarray(C.project_pose(
                cam, jnp.asarray(abs_loc),
                world_rot=jnp.asarray(world_rot)))[..., :2]

            clip = clip.copy()
            clip["projection_2d"] = [projections[i] for i in range(L)]
            clip["relative_rot"] = [rel_rot[i] for i in range(L)]
            clip["absolute_loc"] = [abs_loc[i] for i in range(L)]
            clip["absolute_rot"] = [abs_rot[i] for i in range(L)]
            updated.append(clip)
        return updated

    def _absolute_joints(self, gender: str, pose: np.ndarray) -> np.ndarray:
        """Posed SMPL joints via the body model; falls back to the body-model-
        free path (rest joints unavailable -> zero bone lengths, matching the
        reference's placeholder SMPL reference pose) when models are absent."""
        if self.use_body_model:
            try:
                model = get_body_model(
                    gender if gender in ("male", "female", "neutral")
                    else "neutral")
                jtr = np.asarray(joint_locations(
                    model, pose[:, 3:len(SMPL_SKELETON) * 3],
                    pose[:, :3]))[:, :len(SMPL_SKELETON)]
                return map_from_original(jtr)
            except FileNotFoundError:
                pass
        return np.zeros((len(pose), len(SMPL_SKELETON), 3), np.float32)

    # -- raw data ----------------------------------------------------------
    def _get_raw_data(self, grouped) -> Tuple[np.ndarray, Dict, Dict]:
        projection_2d = self._reshape_to_sequences(grouped, "projection_2d")
        targets = {
            "relative_pose_rot": self._reshape_to_sequences(
                grouped, "relative_rot"),
            "absolute_pose_loc": self._reshape_to_sequences(
                grouped, "absolute_loc"),
            "absolute_pose_rot": self._reshape_to_sequences(
                grouped, "absolute_rot"),
            "world_rot": self._reshape_to_sequences(grouped, "world_rot"),
            "amass_body_pose": self._reshape_to_sequences(
                grouped, "amass_body_pose"),
        }
        head = grouped.head(1).reset_index(drop=False)
        tail = grouped.tail(1).reset_index(drop=False)
        meta = {
            "video_id": tail.loc[:, "dataset"].to_list(),
            "pedestrian_id": tail.loc[:, "id"].to_list(),
            "clip_id": tail.loc[:, "clip"].to_numpy().astype(np.int32),
            "age": tail.loc[:, "age"].to_list(),
            "gender": tail.loc[:, "gender"].to_list(),
            "start_frame": head.loc[:, "frame"].to_numpy().astype(np.int32),
            "end_frame": tail.loc[:, "frame"].to_numpy().astype(np.int32) + 1,
        }
        return projection_2d, targets, meta
