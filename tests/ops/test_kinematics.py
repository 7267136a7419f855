import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.ops import kinematics as K
from pedestrians_video_2_carla_tpu.ops import rotations as R
from pedestrians_video_2_carla_tpu.skeletons.carla import (
    BONE_NAMES, CARLA_SKELETON, load_reference_pose, load_reference_pose_carla)

from .np_reference import fk_recursive, random_rotation_matrices

GOLDEN = os.path.join(os.path.dirname(__file__), "..", "golden",
                      "sk_female_absolute.json")


def test_fk_matches_ue4_golden_absolute_pose():
    """FK(sk_female_relative) must reproduce the UE4-exported absolute pose
    (the reference pins the same equivalence in tests/walker_control/test_pose.py:32-52:
    loc atol 1e-5, rotation euler-deg atol 1e-2, root ignored).

    Runs in float32 (the TPU compute dtype) with fp32-precision matmuls; the
    float64 variant below pins the same equivalence at the golden data's own
    export precision."""
    rel_loc, rel_rot = load_reference_pose("adult_female")
    abs_loc, abs_rot = K.forward_kinematics(rel_loc, rel_rot)

    # golden: raw UE4 absolute transforms, shifted so hips sit at the origin
    with open(GOLDEN) as f:
        golden = json.load(f)
    g_loc = np.asarray([golden[n]["location"] for n in BONE_NAMES]) / 100.0
    g_rot = np.asarray([golden[n]["rotation"] for n in BONE_NAMES])
    hips_idx = int(CARLA_SKELETON.crl_hips__C)
    g_loc = g_loc - g_loc[hips_idx]

    carla_loc = np.asarray(R.p3d_location_to_carla(abs_loc))
    carla_rot = np.asarray(R.matrix_to_carla_rotation(abs_rot))

    for i, name in enumerate(BONE_NAMES):
        if i == int(CARLA_SKELETON.crl_root):
            continue
        np.testing.assert_allclose(
            carla_loc[i], g_loc[i], atol=1e-5,
            err_msg=f"location mismatch for {name}")
        # compare euler angles modulo 360
        diff = (carla_rot[i] - g_rot[i] + 180.0) % 360.0 - 180.0
        np.testing.assert_allclose(
            diff, np.zeros(3), atol=1e-2,
            err_msg=f"rotation mismatch for {name}")


def test_fk_matches_ue4_golden_strict_x64():
    """Same as above but in float64, pinning the reference's own strict
    tolerances (loc 1e-5 m, rot 1e-2 deg)."""
    from contextlib import contextmanager

    @contextmanager
    def enable_x64():
        jax.config.update("jax_enable_x64", True)
        try:
            yield
        finally:
            jax.config.update("jax_enable_x64", False)

    with open(GOLDEN) as f:
        golden = json.load(f)
    g_loc = np.asarray([golden[n]["location"] for n in BONE_NAMES]) / 100.0
    g_rot = np.asarray([golden[n]["rotation"] for n in BONE_NAMES])
    hips_idx = int(CARLA_SKELETON.crl_hips__C)
    g_loc = g_loc - g_loc[hips_idx]

    with enable_x64():
        rel_loc, rel_pyr, _ = load_reference_pose_carla("adult_female")
        p3d_loc = np.stack([rel_loc[:, 0], rel_loc[:, 1], -rel_loc[:, 2]], -1)
        angles = np.deg2rad(
            np.stack([-rel_pyr[:, 2], -rel_pyr[:, 0], -rel_pyr[:, 1]], -1))
        p3d_rot = R.euler_angles_to_matrix(angles, "XYZ")
        abs_loc, abs_rot = K.forward_kinematics(p3d_loc, p3d_rot)
        carla_loc = np.asarray(R.p3d_location_to_carla(abs_loc))
        carla_rot = np.asarray(R.matrix_to_carla_rotation(abs_rot))

    root = int(CARLA_SKELETON.crl_root)
    keep = [i for i in range(len(BONE_NAMES)) if i != root]
    np.testing.assert_allclose(carla_loc[keep], g_loc[keep], atol=1e-5)
    diff = (carla_rot[keep] - g_rot[keep] + 180.0) % 360.0 - 180.0
    np.testing.assert_allclose(diff, np.zeros_like(diff), atol=1e-2)


def test_fk_matches_recursive_reference_random_poses(rng):
    rel_loc, rel_rot0 = load_reference_pose("adult_male")
    for _ in range(3):
        rel_rot = np.asarray(
            random_rotation_matrices(rng, (26,)) @ rel_rot0, dtype=np.float64)
        ours_loc, ours_rot = K.forward_kinematics(
            rel_loc.astype(np.float64), rel_rot)
        # JAX runs float32 unless x64 is enabled; the numpy recursion is float64,
        # so the comparison bounds float32 accumulation error, not the algorithm.
        exp_loc, exp_rot = fk_recursive(rel_loc.astype(np.float64), rel_rot)
        np.testing.assert_allclose(np.asarray(ours_loc), exp_loc, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ours_rot), exp_rot, atol=1e-4)


def test_fk_batched_consistency(rng):
    """Same input in every batch row => identical rows; different inputs differ
    (reference tests/walker_control/test_p3d_pose.py:58-101)."""
    rel_loc, rel_rot = load_reference_pose("adult_female")
    batch_loc = np.broadcast_to(rel_loc, (4, 26, 3))
    batch_rot = np.broadcast_to(rel_rot, (4, 26, 3, 3))
    abs_loc, abs_rot = K.forward_kinematics(jnp.asarray(batch_loc),
                                            jnp.asarray(batch_rot))
    for i in range(1, 4):
        np.testing.assert_array_equal(abs_loc[0], abs_loc[i])
        np.testing.assert_array_equal(abs_rot[0], abs_rot[i])

    rand_rot = random_rotation_matrices(rng, (4, 26)).astype(np.float32)
    abs_loc2, _ = K.forward_kinematics(jnp.asarray(batch_loc),
                                       jnp.asarray(rand_rot))
    assert not np.allclose(abs_loc2[0], abs_loc2[1])


def test_accumulate_pose_changes_matches_sequential(rng):
    B, L = 2, 7
    changes = random_rotation_matrices(rng, (B, L, 26)).astype(np.float32)
    init = random_rotation_matrices(rng, (B, 26)).astype(np.float32)
    ours = np.asarray(K.accumulate_pose_changes(
        jnp.asarray(changes), jnp.asarray(init)))
    # sequential reference: R_t = C_t @ R_{t-1}
    prev = init.copy()
    for t in range(L):
        prev = changes[:, t] @ prev
        np.testing.assert_allclose(ours[:, t], prev, atol=1e-5)


def test_world_from_changes_matches_sequential(rng):
    B, L = 3, 6
    dloc = rng.normal(size=(B, L, 3)).astype(np.float32)
    drot = random_rotation_matrices(rng, (B, L)).astype(np.float32)
    loc, rot = K.world_from_changes((B, L), jnp.asarray(dloc), jnp.asarray(drot))
    loc, rot = np.asarray(loc), np.asarray(rot)

    w_loc = np.zeros((B, 3))
    w_rot = np.broadcast_to(np.eye(3), (B, 3, 3)).copy()
    for t in range(L):
        w_rot = w_rot @ drot[:, t]
        w_loc = w_loc + dloc[:, t]
        np.testing.assert_allclose(loc[:, t], w_loc, atol=1e-5)
        np.testing.assert_allclose(rot[:, t], w_rot, atol=1e-5)


def test_world_from_changes_defaults():
    loc, rot = K.world_from_changes((2, 5))
    assert loc.shape == (2, 5, 3) and rot.shape == (2, 5, 3, 3)
    assert np.all(np.asarray(loc) == 0)
    np.testing.assert_array_equal(
        np.asarray(rot), np.broadcast_to(np.eye(3, dtype=np.float32), (2, 5, 3, 3)))


def test_fk_is_jittable_and_differentiable():
    rel_loc, rel_rot = load_reference_pose("adult_female")

    @jax.jit
    def loss_fn(rot):
        abs_loc, _ = K.forward_kinematics(rel_loc, rot)
        return jnp.sum(abs_loc ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(rel_rot))
    assert g.shape == (26, 3, 3)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).sum() > 0
