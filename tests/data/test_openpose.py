"""JAAD OpenPose datamodule end-to-end with synthesized annotation CSV +
OpenPose-format keypoint JSONs (mirrors the reference's committed
JAADOpenPoseDataModule fixtures, built fresh from this framework's reference
projections instead of copied)."""
import json
import os

import numpy as np
import pandas as pd
import pytest

from pedestrians_video_2_carla_tpu.data.openpose.datamodules import \
    JAADOpenPoseDataModule
from pedestrians_video_2_carla_tpu.skeletons import (BODY_25_SKELETON,
                                                     CARLA_SKELETON, map_pose)

N_VIDEOS = 4
N_FRAMES = 24
CLIP_LEN = 6


@pytest.fixture(scope="module")
def jaad_root(tmp_path_factory):
    from pedestrians_video_2_carla_tpu.ops.reference_skeletons import \
        reference_projections

    root = tmp_path_factory.mktemp("datasets")
    jaad = root / "JAAD"
    ref = reference_projections()[0, :, :2]  # (26, 2) CARLA screen px
    b25 = np.asarray(map_pose(ref[None], CARLA_SKELETON,
                              BODY_25_SKELETON))[0]  # (25, 2)

    rng = np.random.default_rng(1)
    rows = []
    for vid in range(N_VIDEOS):
        video_id = f"video_{vid:04d}"
        op_dir = jaad / "openpose" / video_id
        os.makedirs(op_dir, exist_ok=True)
        for frame in range(N_FRAMES):
            kp = b25 + rng.normal(scale=2.0, size=b25.shape)
            kp3 = np.concatenate([kp, np.full((len(kp), 1), 0.9)], axis=-1)
            # an extra bogus detection far away tests the IoU matching
            bogus = kp3.copy()
            bogus[:, 0] += 300
            with open(op_dir / f"{video_id}_{frame:012d}_keypoints.json",
                      "w") as f:
                json.dump({"people": [
                    {"pose_keypoints_2d": bogus.reshape(-1).tolist()},
                    {"pose_keypoints_2d": kp3.reshape(-1).tolist()},
                ]}, f)
            x1, y1 = kp.min(axis=0)
            x2, y2 = kp.max(axis=0)
            rows.append({
                "beh": True, "video": video_id, "frame": frame,
                "x1": x1, "y1": y1, "x2": x2, "y2": y2,
                "id": f"0_{vid}_1b", "gender": "male", "age": "adult",
                "crossing": "1" if vid % 2 else "0",
                "crossing_point": N_FRAMES - 4,
                "video_width": 800, "video_height": 600,
            })
    pd.DataFrame(rows).to_csv(jaad / "annotations.csv", index=False)
    return str(root)


def test_jaad_openpose_end_to_end(jaad_root, tmp_path):
    dm = JAADOpenPoseDataModule(
        datasets_dir=jaad_root, outputs_dir=str(tmp_path),
        batch_size=4, clip_length=CLIP_LEN, clip_offset=3,
        val_set_frac=0.25, test_set_frac=0.25,
        input_nodes=CARLA_SKELETON, needs_confidence=False)
    dm.prepare_data()
    dm.setup("fit")
    batch = next(iter(dm.train_batches()))
    inputs, targets, meta = batch
    # BODY_25 data remapped to the 26-joint CARLA input skeleton
    assert inputs.shape == (4, CLIP_LEN, 26, 2)
    assert targets["bboxes"].shape == (4, CLIP_LEN, 2, 2)
    assert "crossing" in targets
    # unmapped CARLA joints (crl_root etc.) are zero-filled
    root_joint = int(CARLA_SKELETON.crl_root)
    assert np.all(np.asarray(inputs)[..., root_joint, :] == 0)


def test_jaad_iou_matching_picks_correct_candidate(jaad_root, tmp_path):
    from pedestrians_video_2_carla_tpu.data.base.hdf5_utils import load_subset
    dm = JAADOpenPoseDataModule(
        datasets_dir=jaad_root, outputs_dir=str(tmp_path),
        batch_size=2, clip_length=CLIP_LEN, clip_offset=3)
    dm.prepare_data()
    path = os.path.join(dm.subsets_dir, "train.hdf5")
    projection_2d, _, _ = load_subset(path)
    # the bogus candidate sits at x+300; the matcher must have rejected it
    detected = projection_2d[..., 0][np.any(projection_2d[..., :2] != 0,
                                            axis=-1)]
    assert detected.max() < 700


def test_strong_points_filter(jaad_root, tmp_path):
    dm_all = JAADOpenPoseDataModule(
        datasets_dir=jaad_root, outputs_dir=str(tmp_path / "a"),
        batch_size=2, clip_length=CLIP_LEN, clip_offset=3, strong_points=0)
    dm_strong = JAADOpenPoseDataModule(
        datasets_dir=jaad_root, outputs_dir=str(tmp_path / "b"),
        batch_size=2, clip_length=CLIP_LEN, clip_offset=3, strong_points=1.0)
    assert dm_all.settings_digest != dm_strong.settings_digest
    dm_strong.prepare_data()
    # all our synthetic keypoints are present, so nothing is filtered
    assert sum(dm_strong._set_size.values()) > 0
