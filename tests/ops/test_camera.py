import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.ops import camera as C


def test_default_camera_focal():
    cam = C.make_camera()
    assert np.isclose(cam.focal[0], 400.0)
    assert cam.principal == (400.0, 300.0)
    assert cam.image_size == (800, 600)


def test_look_at_center_projects_to_principal_point():
    cam = C.make_camera()
    # the look-at point (pedestrian hips height) must project to image center
    pts = jnp.asarray([[0.0, 0.0, -1.2]])
    out = np.asarray(cam.project(pts))
    np.testing.assert_allclose(out[0, :2], [400.0, 300.0], atol=1e-4)
    np.testing.assert_allclose(out[0, 2], 3.1, atol=1e-5)


def test_projection_hand_computed_points():
    cam = C.make_camera()
    # 0.5 m above the look-at point: y_screen = 300 - 400*0.5/3.1, x centered
    out = np.asarray(cam.project(jnp.asarray([[0.0, 0.0, -1.7]])))
    np.testing.assert_allclose(out[0, 0], 400.0, atol=1e-4)
    np.testing.assert_allclose(out[0, 1], 300.0 - 400.0 * 0.5 / 3.1, atol=1e-3)
    # higher points have smaller y (screen y grows downwards)
    hi = np.asarray(cam.project(jnp.asarray([[0.0, 0.0, -2.0]])))
    lo = np.asarray(cam.project(jnp.asarray([[0.0, 0.0, -0.5]])))
    assert hi[0, 1] < lo[0, 1]


def test_project_pose_world_transform_shifts_depth():
    cam = C.make_camera()
    pose = jnp.zeros((1, 1, 26, 3))
    base = np.asarray(C.project_pose(cam, pose))
    # move pedestrian 1m along world +x (towards camera at world x=3.1):
    # P3D world x == pose-space y => world_loc applies after the axis swap
    world_loc = jnp.asarray([[[1.0, 0.0, 0.0]]])
    closer = np.asarray(C.project_pose(cam, pose, world_loc=world_loc))
    assert closer[0, 0, 0, 2] < base[0, 0, 0, 2]
    np.testing.assert_allclose(closer[0, 0, 0, 2], base[0, 0, 0, 2] - 1.0, atol=1e-5)


def test_project_pose_rotation_invariance_of_on_axis_point():
    cam = C.make_camera()
    # a point on the rotation axis (origin) is invariant under world rotation
    pose = jnp.zeros((2, 3, 26, 3))
    rot = jnp.broadcast_to(jnp.asarray(
        [[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]]), (2, 3, 3, 3))
    out_rot = np.asarray(C.project_pose(cam, pose, world_rot=rot))
    out_id = np.asarray(C.project_pose(cam, pose))
    np.testing.assert_allclose(out_rot, out_id, atol=1e-5)


def test_pose_space_axes_map_correctly():
    cam = C.make_camera()
    # pose-space +x maps to screen-right (see ops/camera.py derivation)
    right = np.asarray(C.project_pose(cam, jnp.asarray([[0.5, 0.0, 0.0]])))
    left = np.asarray(C.project_pose(cam, jnp.asarray([[-0.5, 0.0, 0.0]])))
    assert right[0, 0] > 400.0 > left[0, 0]
    # pose-space +y moves towards the camera (smaller depth)
    towards = np.asarray(C.project_pose(cam, jnp.asarray([[0.0, 0.5, 0.0]])))
    assert towards[0, 2] < 3.1
