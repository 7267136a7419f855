import jax
import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.ops import augmentation as A
from pedestrians_video_2_carla_tpu.ops import deformation as D
from pedestrians_video_2_carla_tpu.ops.tensors import get_bboxes
from pedestrians_video_2_carla_tpu.skeletons import BODY_25_SKELETON


def _pose(rng, B=3, L=4, J=25, C=2):
    return jnp.asarray(
        (rng.normal(size=(B, L, J, C)) * 50 + 300).astype(np.float32))


def test_flip_permutes_and_mirrors(rng):
    pose = _pose(rng)
    flipped, _ = A.flip_pose(pose, jnp.asarray([True, False, True]),
                             BODY_25_SKELETON)
    flipped = np.asarray(flipped)
    # non-flipped clip untouched
    np.testing.assert_array_equal(flipped[1], np.asarray(pose[1]))
    # y coordinates permuted by flip mask
    mask = np.asarray(BODY_25_SKELETON.get_flip_mask())
    np.testing.assert_allclose(flipped[0][..., 1],
                               np.asarray(pose)[0][..., mask, 1], atol=1e-5)


def test_flip_is_involution_around_static_center(rng):
    pose = _pose(rng)
    flags = jnp.asarray([True, True, False])
    bboxes = get_bboxes(pose)
    once, _ = A.flip_pose(pose, flags, BODY_25_SKELETON, bboxes=bboxes)
    # NOTE: flipping changes the bbox x-extents symmetrically around the same
    # center, so flipping twice with freshly computed centers restores the pose
    twice, _ = A.flip_pose(once, flags, BODY_25_SKELETON)
    np.testing.assert_allclose(np.asarray(twice), np.asarray(pose), atol=1e-3)


def test_rotation_inverts_exactly(rng):
    pose = _pose(rng)
    angles = jnp.asarray([10.0, -7.5, 0.0])
    bboxes = get_bboxes(pose)
    rotated, new_bb = A.rotate_pose(pose, angles, bboxes=bboxes)
    # the rotated AABB's center coincides with the pre-rotation center, so
    # rotating back around it restores the pose exactly
    back, _ = A.rotate_pose(rotated, -angles, bboxes=new_bb)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pose), atol=1e-2)


def test_augment_invert_roundtrip(rng):
    pose = _pose(rng)
    aug = A.AugmentPose(BODY_25_SKELETON, flip=0.5, rotate=10.0)
    key = jax.random.PRNGKey(3)
    out, bboxes, params = aug(key, pose)
    assert bool(np.asarray(params.is_flipped).any())
    recovered = aug.invert(out, params, bboxes=bboxes)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(pose),
                               atol=5e-2)


def test_missing_joints_stay_zero_through_augment(rng):
    pose = np.array(_pose(rng))  # writable copy
    pose[:, :, 7] = 0.0  # missing joint (exact zeros)
    rotated, _ = A.rotate_pose(jnp.asarray(pose), jnp.asarray([15.0, 5.0, -3.0]))
    assert np.all(np.asarray(rotated)[:, :, 7] == 0.0)
    # reference semantics: zeros stay at their original *slots* after a flip
    # (the missing mask is computed pre-permutation and re-applied in place,
    # random_flip.py:46-71)
    flipped, _ = A.flip_pose(jnp.asarray(pose), jnp.asarray([True] * 3),
                             BODY_25_SKELETON)
    assert np.all(np.asarray(flipped)[:, :, 7] == 0.0)


def test_deform_noise_and_missing(rng):
    pose = _pose(rng, C=3)
    key = jax.random.PRNGKey(7)
    noisy = D.add_noise(key, pose, "gaussian", 2.0)
    assert not np.allclose(np.asarray(noisy)[..., :2], np.asarray(pose)[..., :2])
    np.testing.assert_array_equal(np.asarray(noisy)[..., 2],
                                  np.asarray(pose)[..., 2])

    probs = np.zeros(25, dtype=np.float32)
    probs[3] = 1.0
    dropped = D.drop_joints(key, pose, jnp.asarray(probs))
    assert np.all(np.asarray(dropped)[:, :, 3] == 0.0)
    np.testing.assert_array_equal(np.asarray(dropped)[:, :, 4],
                                  np.asarray(pose)[:, :, 4])

    uniform = D.add_noise(key, pose, "uniform", 1.0)
    delta = np.asarray(uniform)[..., :2] - np.asarray(pose)[..., :2]
    assert np.abs(delta).max() <= 0.5 + 1e-6


def test_flip_with_clip_size_is_image_flip(rng):
    # reference ``random_flip.py``: when the clip size is known, a flipped
    # pose must land where it would sit in the mirrored *image* (x' = W - x):
    # mirror around the ORIGINAL bbox center, then translate to the
    # flipped-image bbox center. Regression: using the updated center for
    # both steps put joints at 2*c_new - x, outside the image.
    pose = _pose(rng, B=2)
    W = 800.0
    flags = jnp.asarray([True, False])
    bboxes = get_bboxes(pose)
    clip_size = jnp.broadcast_to(jnp.asarray([W, 600.0]), (2, 2))
    flipped, new_bb = A.flip_pose(pose, flags, BODY_25_SKELETON,
                                  bboxes=bboxes, clip_size=clip_size)
    mask = np.asarray(BODY_25_SKELETON.get_flip_mask())
    np.testing.assert_allclose(np.asarray(flipped)[0][..., 0],
                               W - np.asarray(pose)[0][..., mask, 0],
                               atol=1e-3)
    # bboxes mirrored into the flipped image (min/max swapped)
    nb = np.asarray(new_bb)[0]
    ob = np.asarray(bboxes)[0]
    np.testing.assert_allclose(nb[..., 0], W - ob[..., ::-1, 0], atol=1e-3)
    # non-flipped clip untouched
    np.testing.assert_array_equal(np.asarray(flipped)[1], np.asarray(pose)[1])


def test_augment_invert_roundtrip_with_clip_size(rng):
    pose = _pose(rng)
    aug = A.AugmentPose(BODY_25_SKELETON, flip=0.9, rotate=10.0)
    clip_size = jnp.broadcast_to(jnp.asarray([800.0, 600.0]), (3, 2))
    out, bboxes, params = aug(jax.random.PRNGKey(3), pose,
                              clip_size=clip_size)
    assert bool(np.asarray(params.is_flipped).any())
    recovered = aug.invert(out, params, bboxes=bboxes, clip_size=clip_size)
    np.testing.assert_allclose(np.asarray(recovered), np.asarray(pose),
                               atol=5e-2)
