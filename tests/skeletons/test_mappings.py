import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.skeletons import (
    BODY_25_SKELETON, CARLA_SKELETON, COCO_SKELETON, MPII_SKELETON,
    SMPL_SKELETON, get_common_indices, get_skeleton_type_by_name, map_pose)


def test_enum_sizes_and_key_joints():
    assert len(CARLA_SKELETON) == 26
    assert len(BODY_25_SKELETON) == 25
    assert len(COCO_SKELETON) == 18
    assert len(SMPL_SKELETON) == 22
    assert len(MPII_SKELETON) == 16
    # reference index facts (data/openpose/skeleton.py, data/smpl/skeleton.py)
    assert BODY_25_SKELETON.MidHip == 8
    assert BODY_25_SKELETON.RHeel == 24
    assert COCO_SKELETON.LEar == 17
    assert SMPL_SKELETON.Pelvis == 0 and SMPL_SKELETON.L_Foot == 21
    assert MPII_SKELETON.RAnkle == 0 and MPII_SKELETON.LWrist == 15
    assert CARLA_SKELETON.crl_root == 0 and CARLA_SKELETON.crl_toeEnd__L == 25


def test_registry_lookup():
    assert get_skeleton_type_by_name("BODY_25_SKELETON") is BODY_25_SKELETON
    assert get_skeleton_type_by_name("CARLA_SKELETON") is CARLA_SKELETON


def test_identity_common_indices():
    out_idx, in_idx = get_common_indices(CARLA_SKELETON, CARLA_SKELETON)
    assert out_idx == slice(None) and in_idx == slice(None)


def test_body25_to_carla_mapping_facts():
    # single-sided: BODY_25 data mapped towards CARLA
    carla_idx, b25_idx = get_common_indices(BODY_25_SKELETON, None)
    pairs = dict(zip(b25_idx.tolist(), carla_idx.tolist()))
    assert pairs[int(BODY_25_SKELETON.MidHip)] == int(CARLA_SKELETON.crl_hips__C)
    assert pairs[int(BODY_25_SKELETON.Nose)] == int(CARLA_SKELETON.crl_Head__C)
    assert pairs[int(BODY_25_SKELETON.LShoulder)] == int(CARLA_SKELETON.crl_arm__L)
    assert len(pairs) == 21


def test_cross_skeleton_common_indices_sorted_by_carla():
    out_idx, in_idx = get_common_indices(BODY_25_SKELETON, COCO_SKELETON)
    # COCO has 16 mapped joints, all present in BODY_25's mapping
    assert len(out_idx) == len(in_idx) == 16
    # matching order: remapping a pose keeps joints aligned through CARLA pivot
    b25_names = [BODY_25_SKELETON(i).name for i in in_idx]
    coco_names = [COCO_SKELETON(i).name for i in out_idx]
    assert b25_names == coco_names  # same joint names in both skeletons


def test_map_pose_zero_fills(rng):
    pose = rng.normal(size=(4, 25, 2)).astype(np.float32)
    out = map_pose(pose, BODY_25_SKELETON, CARLA_SKELETON)
    assert out.shape == (4, 26, 2)
    # mapped joint carried over
    np.testing.assert_array_equal(
        out[:, int(CARLA_SKELETON.crl_hips__C)],
        pose[:, int(BODY_25_SKELETON.MidHip)])
    # unmapped CARLA bones (e.g. crl_root, shoulders) are zero
    assert np.all(out[:, int(CARLA_SKELETON.crl_root)] == 0)
    assert np.all(out[:, int(CARLA_SKELETON.crl_shoulder__L)] == 0)


def test_flip_masks_are_involutions():
    for skel in (CARLA_SKELETON, BODY_25_SKELETON, COCO_SKELETON,
                 SMPL_SKELETON, MPII_SKELETON):
        mask = np.asarray(skel.get_flip_mask())
        assert sorted(mask.tolist()) == list(range(len(skel))), skel
        np.testing.assert_array_equal(mask[mask], np.arange(len(skel)))
        # reference spot facts
    b25 = BODY_25_SKELETON.get_flip_mask()
    assert b25[int(BODY_25_SKELETON.LShoulder)] == int(BODY_25_SKELETON.RShoulder)
    assert b25[int(BODY_25_SKELETON.Nose)] == int(BODY_25_SKELETON.Nose)
    mpii = MPII_SKELETON.get_flip_mask()
    assert mpii[int(MPII_SKELETON.RAnkle)] == int(MPII_SKELETON.LAnkle)


def test_smpl_orig_mapping_roundtrip(rng):
    from pedestrians_video_2_carla_tpu.skeletons.smpl import (
        map_from_original, map_to_original)
    orig = rng.normal(size=(5, 22 * 3)).astype(np.float32)
    re_indexed = map_from_original(orig)
    assert re_indexed.shape == (5, 22, 3)
    back = map_to_original(re_indexed)
    np.testing.assert_array_equal(back, orig)
    # Pelvis is index 0 in both orders
    np.testing.assert_array_equal(
        re_indexed[:, int(SMPL_SKELETON.Pelvis)], orig.reshape(5, 22, 3)[:, 0])


def test_adjacency_matrix_symmetric_normalized():
    adj = CARLA_SKELETON.get_adjacency_matrix()
    assert adj.shape == (26, 26)
    np.testing.assert_allclose(adj, adj.T, atol=1e-6)
    assert (np.linalg.eigvalsh(adj) <= 1.0 + 1e-5).all()
