import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.ops import normalization as N
from pedestrians_video_2_carla_tpu.skeletons import BODY_25_SKELETON, CARLA_SKELETON


def _pose_batch(rng, B=2, L=3, J=26, C=2, scale=100.0, shift=300.0):
    return (rng.normal(size=(B, L, J, C)) * scale + shift).astype(np.float32)


def test_hips_neck_normalization_invariants(rng):
    pose = _pose_batch(rng)
    normalized, ss = N.normalize_with(jnp.asarray(pose), CARLA_SKELETON,
                                      extractor="hips_neck")
    normalized = np.asarray(normalized)
    hips = int(CARLA_SKELETON.crl_hips__C)
    neck = int(CARLA_SKELETON.crl_neck__C)
    # hips at origin, ||neck|| == 1 per frame
    np.testing.assert_allclose(normalized[..., hips, :], 0.0, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(normalized[..., neck, :], axis=-1), 1.0, atol=1e-4)


def test_normalize_denormalize_roundtrip(rng):
    pose = _pose_batch(rng)
    normalized, ss = N.normalize_with(jnp.asarray(pose), CARLA_SKELETON)
    back = np.asarray(N.denormalize(normalized, ss))
    np.testing.assert_allclose(back, pose, atol=1e-2)


def test_confidence_channel_preserved_and_zero_conf_pinned(rng):
    pose = _pose_batch(rng, J=25, C=3)
    pose[..., 2] = 1.0
    pose[0, 0, 5, 2] = 0.0  # zero confidence joint
    normalized, _ = N.normalize_with(jnp.asarray(pose), BODY_25_SKELETON)
    normalized = np.asarray(normalized)
    np.testing.assert_array_equal(normalized[..., 2], pose[..., 2])
    np.testing.assert_array_equal(normalized[0, 0, 5, :2], 0.0)


def test_bbox_extractor(rng):
    pose = _pose_batch(rng, J=25)
    ss = N.bbox_shift_scale(jnp.asarray(pose))
    mins = pose.min(axis=-2)
    maxs = pose.max(axis=-2)
    np.testing.assert_allclose(np.asarray(ss.shift), (mins + maxs) / 2, atol=1e-3)
    # scale = distance from center to top edge = half bbox height
    np.testing.assert_allclose(
        np.asarray(ss.scale), (maxs[..., 1] - mins[..., 1]) / 2, atol=1e-3)


def test_fallback_extractor_uses_bbox_when_hips_missing(rng):
    pose = _pose_batch(rng, B=2, J=25)
    # zero-out hips in clip 0 (missing-joint encoding)
    pose[0, :, int(BODY_25_SKELETON.MidHip)] = 0.0
    ss = N.hips_neck_bbox_fallback_shift_scale(
        jnp.asarray(pose), BODY_25_SKELETON)
    bb = N.bbox_shift_scale(jnp.asarray(pose))
    hn = N.hips_neck_shift_scale(jnp.asarray(pose), BODY_25_SKELETON)
    # clip 0: bbox fallback scale; clip 1: hips-neck
    np.testing.assert_allclose(np.asarray(ss.scale[0]),
                               np.asarray(bb.scale[0]) * N.FALLBACK_SCALE,
                               rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss.scale[1]),
                               np.asarray(hn.scale[1]), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(ss.shift[1]),
                               np.asarray(hn.shift[1]), rtol=1e-5)
    # fallback shift offset from bbox center by documented constants
    expected_shift = np.asarray(bb.shift[0]) + np.asarray(bb.scale[0])[..., None] \
        * np.asarray([N.FALLBACK_X_SHIFT, N.FALLBACK_Y_SHIFT])
    np.testing.assert_allclose(np.asarray(ss.shift[0]), expected_shift, rtol=1e-4)


def test_reference_skeletons_denormalizer():
    from pedestrians_video_2_carla_tpu.ops import reference_skeletons as RS
    proj = RS.reference_projections()
    assert proj.shape == (4, 26, 3)
    # all four reference skeletons project inside the 800x600 frame
    assert (proj[..., 0] > 0).all() and (proj[..., 0] < 800).all()
    assert (proj[..., 1] > 0).all() and (proj[..., 1] < 600).all()

    # denormalizing a normalized reference pose must recover its projection
    frames = jnp.asarray(proj[None, None, 0, :, :2])  # (1, 1, 26, 2)
    idx = jnp.asarray([0])
    out = np.asarray(RS.denormalize_from_projection(
        frames, idx, autonormalize=True))
    np.testing.assert_allclose(out[0, 0], proj[0, :, :2], atol=1e-2)


def test_degenerate_pose_normalize_grad_is_finite():
    """A predicted pose whose neck and hips land on the same pixel must not
    NaN the gradient: jnp.linalg.norm at exactly 0 yields NaN cotangents even
    under a zero outer gradient (observed at model init on TPU, where it
    NaN'd entire training runs)."""
    import jax

    from pedestrians_video_2_carla_tpu.ops import normalization as N
    from pedestrians_video_2_carla_tpu.skeletons.carla import CARLA_SKELETON

    pose = jnp.ones((2, 3, 26, 2))  # every joint identical -> scale == 0

    def loss(p):
        out, _ = N.normalize_with(p, CARLA_SKELETON, "hips_neck")
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(pose)
    assert bool(jnp.isfinite(g).all())

    def loss_bbox(p):
        out, _ = N.normalize_with(p, CARLA_SKELETON, "bbox")
        return jnp.sum(out ** 2)

    g = jax.grad(loss_bbox)(pose)
    assert bool(jnp.isfinite(g).all())
