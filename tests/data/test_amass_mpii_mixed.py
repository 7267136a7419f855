"""AMASS / MPII / Mixed datamodules with synthesized fixtures."""
import os

import numpy as np
import pandas as pd
import pytest

N_MOCAPS = 5
MOCAP_FRAMES = 120  # 60 fps
CLIP_LEN = 6


@pytest.fixture(scope="module")
def amass_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("amass_datasets")
    rng = np.random.default_rng(3)
    for i in range(N_MOCAPS):
        d = root / "AMASS" / "TestSet" / f"subject_{i}"
        os.makedirs(d, exist_ok=True)
        # 52-joint SMPL-H style pose vector (axis-angle), small motions
        poses = rng.normal(scale=0.1, size=(MOCAP_FRAMES, 156))
        np.savez(d / f"mocap_{i}.npz", poses=poses,
                 gender=np.array("female"))
    return str(root)


@pytest.fixture(scope="module")
def smpl_model_root(tmp_path_factory):
    """Fake SMPL-X model npz with a plausible joint regressor."""
    root = tmp_path_factory.mktemp("models")
    rng = np.random.default_rng(4)
    n_verts, n_joints = 200, 55
    v_template = rng.normal(scale=0.3, size=(n_verts, 3))
    j_regressor = np.zeros((n_joints, n_verts))
    for j in range(n_joints):
        j_regressor[j, (j * 3) % n_verts] = 1.0
    kintree = np.zeros((2, n_joints), dtype=np.int64)
    # simple chain + branches resembling SMPL topology for the first 22
    parents = [-1, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14,
               16, 17, 18, 19] + list(range(20, 53))
    kintree[0] = np.asarray(parents[:n_joints])
    for gender in ("male", "female", "neutral"):
        d = root / gender
        os.makedirs(d, exist_ok=True)
        np.savez(d / "model.npz", v_template=v_template,
                 J_regressor=j_regressor, kintree_table=kintree)
    return str(root)


def test_body_model_joint_locations(smpl_model_root):
    from pedestrians_video_2_carla_tpu.data.smpl.body_model import (
        joint_locations, load_body_model_npz)
    model = load_body_model_npz(
        os.path.join(smpl_model_root, "neutral", "model.npz"), num_joints=22)
    assert model.rest_joints.shape == (22, 3)
    # zero pose -> rest joints
    jtr = np.asarray(joint_locations(
        model, np.zeros((3, 21 * 3), np.float32)))
    np.testing.assert_allclose(jtr[0], model.rest_joints, atol=1e-5)
    # posed joints move, root stays
    jtr2 = np.asarray(joint_locations(
        model, np.full((1, 21 * 3), 0.3, np.float32)))
    np.testing.assert_allclose(jtr2[0, 0], model.rest_joints[0], atol=1e-5)
    assert not np.allclose(jtr2[0, 5:], model.rest_joints[5:], atol=1e-3)


def test_amass_datamodule_end_to_end(amass_root, tmp_path):
    from pedestrians_video_2_carla_tpu.data.smpl.amass import AMASSDataModule
    dm = AMASSDataModule(
        datasets_dir=amass_root, outputs_dir=str(tmp_path),
        batch_size=4, clip_length=CLIP_LEN, clip_offset=CLIP_LEN,
        use_body_model=False,  # no SMPL model files in CI
        val_set_frac=0.25, test_set_frac=0.25)
    dm.prepare_data()
    dm.setup("fit")
    batch = next(iter(dm.train_batches()))
    inputs, targets, meta = batch
    assert inputs.shape[1:] == (CLIP_LEN, 22, 2)
    assert targets["relative_pose_rot"].shape[1:] == (CLIP_LEN, 22, 3, 3)
    assert targets["world_rot"].shape[1:] == (CLIP_LEN, 3, 3)
    # world_rot starts at identity (yaw re-zeroed to first frame)
    np.testing.assert_allclose(
        np.asarray(targets["world_rot"])[:, 0],
        np.broadcast_to(np.eye(3), (inputs.shape[0], 3, 3)), atol=1e-4)


def test_mpii_datamodule(tmp_path):
    from scipy.io import savemat

    from pedestrians_video_2_carla_tpu.data.mpii.mpii import MPIIDataModule

    rng = np.random.default_rng(5)
    n_imgs = 12
    annolist = []
    for i in range(n_imgs):
        points = [{"id": j, "x": float(rng.uniform(0, 600)),
                   "y": float(rng.uniform(0, 400)), "is_visible": 1}
                  for j in range(16)]
        annolist.append({
            "image": {"name": f"img_{i:05d}.jpg"},
            "annorect": {"x1": 10, "y1": 10, "x2": 60, "y2": 60,
                         "scale": 2.0, "objpos": {"x": 300, "y": 200},
                         "annopoints": {"point": points}},
            "vididx": (i % 3) + 1,
            "frame_sec": i,
        })
    mat = {"RELEASE": {
        "annolist": annolist,
        "video_list": ["vidA", "vidB", "vidC"],
        "single_person": [1] * n_imgs,
        "img_train": np.ones(n_imgs, dtype=np.int64),
    }}
    d = tmp_path / "datasets" / "MPII"
    os.makedirs(d, exist_ok=True)
    savemat(d / "mpii_human_pose_v1_u12_1.mat", mat)

    dm = MPIIDataModule(datasets_dir=str(tmp_path / "datasets"),
                        outputs_dir=str(tmp_path / "out"),
                        batch_size=2, val_set_frac=0.3, test_set_frac=0)
    dm.prepare_data()
    dm.setup("fit")
    batch = next(iter(dm.train_batches()))
    inputs, targets, meta = batch
    assert inputs.shape[1:] == (1, 16, 2)
    assert "joints_visibility" in targets


def test_missing_joint_probability_remap():
    from pedestrians_video_2_carla_tpu.data.mixed.mixed import \
        map_missing_joint_probabilities
    from pedestrians_video_2_carla_tpu.skeletons import (BODY_25_SKELETON,
                                                         CARLA_SKELETON)
    probs = [0.1] * 25
    probs[int(BODY_25_SKELETON.MidHip)] = 0.9
    mapped = map_missing_joint_probabilities(
        probs, BODY_25_SKELETON, CARLA_SKELETON)
    assert len(mapped) == 26
    assert mapped[int(CARLA_SKELETON.crl_hips__C)] == pytest.approx(0.9)
    # unmapped CARLA joints get the mean probability
    mean = np.mean(probs)
    assert mapped[int(CARLA_SKELETON.crl_root)] == pytest.approx(mean)


def test_mixed_datamodule_interleaves(tmp_path, amass_root):
    """Mix AMASS with a second AMASS instance (structure-level test — member
    type diversity is covered by the JAAD/CarlaRec tests)."""
    from pedestrians_video_2_carla_tpu.data.mixed.mixed import MixedDataModule
    from pedestrians_video_2_carla_tpu.data.smpl.amass import AMASSDataModule
    from pedestrians_video_2_carla_tpu.skeletons import SMPL_SKELETON

    class TwoAmass(MixedDataModule):
        data_modules = [AMASSDataModule, AMASSDataModule]

    dm = TwoAmass(
        datasets_dir=amass_root,
        outputs_dir=str(tmp_path),
        data_modules_kwargs={},
        batch_size=2, clip_length=CLIP_LEN, clip_offset=CLIP_LEN,
        use_body_model=False,
        input_nodes=SMPL_SKELETON,
        train_proportions=[0.5, 0.5],
        val_proportions=[-1, -1], test_proportions=[-1, -1],
        val_set_frac=0.25, test_set_frac=0.25)
    dm.prepare_data()
    dm.setup("fit")
    batches = list(dm.train_batches())
    assert len(batches) >= 2
    inputs, targets, meta = batches[0]
    assert inputs.shape[1:] == (CLIP_LEN, 22, 2)
