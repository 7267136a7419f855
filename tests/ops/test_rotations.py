import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.ops import rotations as R

from .np_reference import euler_to_matrix_xyz


def test_euler_to_matrix_matches_numpy_reference(rng):
    angles = rng.uniform(-np.pi, np.pi, size=(50, 3))
    ours = np.asarray(R.euler_angles_to_matrix(angles, "XYZ"))
    expected = np.stack([euler_to_matrix_xyz(a) for a in angles])
    np.testing.assert_allclose(ours, expected, atol=1e-6)


def test_euler_matrix_roundtrip(rng):
    # stay away from gimbal lock (|pitch| < pi/2)
    angles = rng.uniform(-1.5, 1.5, size=(100, 3))
    mats = R.euler_angles_to_matrix(angles, "XYZ")
    back = np.asarray(R.matrix_to_euler_angles(mats, "XYZ"))
    np.testing.assert_allclose(back, angles, atol=1e-5)


def test_rotation_6d_roundtrip(rng):
    from .np_reference import random_rotation_matrices
    mats = random_rotation_matrices(rng, (40,))
    d6 = R.matrix_to_rotation_6d(mats)
    assert d6.shape == (40, 6)
    back = np.asarray(R.rotation_6d_to_matrix(d6))
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_rotation_6d_renormalizes(rng):
    d6 = rng.normal(size=(30, 6))
    mats = np.asarray(R.rotation_6d_to_matrix(d6))
    # results are valid rotations
    eye = np.einsum("...ij,...kj->...ik", mats, mats)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (30, 3, 3)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(mats), np.ones(30), atol=1e-5)


def test_carla_rotation_roundtrip(rng):
    pyr = rng.uniform(-80, 80, size=(30, 3))
    mats = R.carla_rotation_to_matrix(pyr)
    back = np.asarray(R.matrix_to_carla_rotation(mats))
    np.testing.assert_allclose(back, pyr, atol=1e-4)


def test_carla_identity():
    mat = np.asarray(R.carla_rotation_to_matrix(np.zeros(3)))
    np.testing.assert_allclose(mat, np.eye(3), atol=1e-7)


@pytest.mark.parametrize("axis,angle_deg", [("pitch", 30.0), ("yaw", 45.0), ("roll", 60.0)])
def test_carla_single_axis_is_pure_rotation(axis, angle_deg):
    pyr = {"pitch": [angle_deg, 0, 0], "yaw": [0, angle_deg, 0],
           "roll": [0, 0, angle_deg]}[axis]
    mat = np.asarray(R.carla_rotation_to_matrix(np.asarray(pyr, dtype=np.float32)))
    # orthonormal with +1 determinant
    np.testing.assert_allclose(mat @ mat.T, np.eye(3), atol=1e-6)
    assert np.isclose(np.linalg.det(mat), 1.0, atol=1e-6)
    # rotation angle preserved
    trace = np.trace(mat)
    recovered = np.rad2deg(np.arccos(np.clip((trace - 1) / 2, -1, 1)))
    assert np.isclose(recovered, angle_deg, atol=1e-3)
