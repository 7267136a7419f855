"""Direct tests of the jit preprocessing graph (ops/preprocessing.py ::
process_batch) — the fused equivalent of the reference's per-clip dataset
pipeline (base_dataset.py:206-234 + projection_2d_mixin.py:209-232):
augment -> deform -> normalize -> skeleton remap -> confidence."""
import jax
import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.ops.preprocessing import (
    PreprocessingConfig, process_batch, remap_nodes)
from pedestrians_video_2_carla_tpu.skeletons import (BODY_25_SKELETON,
                                                     CARLA_SKELETON,
                                                     get_common_indices)

B, L = 2, 4
KEY = jax.random.PRNGKey(0)


def _raw(skeleton=CARLA_SKELETON, channels=2, seed=1):
    J = len(skeleton)
    return 100.0 + 50.0 * jax.random.normal(
        jax.random.PRNGKey(seed), (B, L, J, channels))


def test_passthrough_identity_config():
    cfg = PreprocessingConfig(data_nodes=CARLA_SKELETON,
                              input_nodes=CARLA_SKELETON, transform="none")
    raw = _raw()
    inputs, targets = process_batch(KEY, raw, cfg)
    np.testing.assert_allclose(np.asarray(inputs), np.asarray(raw))
    np.testing.assert_allclose(np.asarray(targets["projection_2d"]),
                               np.asarray(raw))
    assert "projection_2d_deformed" not in targets
    assert "projection_2d_transformed" not in targets


def test_deform_keeps_ground_truth_clean_and_zeroes_missing():
    J = len(CARLA_SKELETON)
    missing = [0.0] * J
    missing[5] = 1.0  # force joint 5 missing in every frame
    cfg = PreprocessingConfig(data_nodes=CARLA_SKELETON,
                              input_nodes=CARLA_SKELETON, transform="none",
                              noise="gaussian", noise_param=2.0,
                              missing_joint_probabilities=tuple(missing))
    raw = _raw()
    inputs, targets = process_batch(KEY, raw, cfg)
    # ground truth untouched by deformation (reference: deform does NOT
    # carry to targets)
    np.testing.assert_allclose(np.asarray(targets["projection_2d"]),
                               np.asarray(raw))
    deformed = np.asarray(targets["projection_2d_deformed"])
    assert not np.allclose(deformed, np.asarray(raw))  # noise applied
    np.testing.assert_allclose(deformed[:, :, 5], 0.0)  # p=1 joint zeroed
    np.testing.assert_allclose(np.asarray(inputs), deformed)


def test_normalization_uses_clean_shift_scale_for_targets():
    cfg = PreprocessingConfig(data_nodes=CARLA_SKELETON,
                              input_nodes=CARLA_SKELETON,
                              transform="hips_neck",
                              noise="gaussian", noise_param=5.0)
    raw = _raw()
    inputs, targets = process_batch(KEY, raw, cfg)
    # the transformed target is the CLEAN pose under its own shift/scale:
    # un-normalizing with the saved shift/scale must reproduce the raw pose
    shift = np.asarray(targets["projection_2d_shift"])[..., None, :]
    scale = np.asarray(targets["projection_2d_scale"])[..., None, None]
    recon = np.asarray(targets["projection_2d_transformed"]) * scale + shift
    np.testing.assert_allclose(recon, np.asarray(raw), atol=1e-3)
    # inputs come from the DEFORMED pose's own normalization, so they differ
    assert not np.allclose(np.asarray(inputs),
                           np.asarray(targets["projection_2d_transformed"]))


def test_remap_body25_to_carla_gather_and_zero_fill():
    cfg = PreprocessingConfig(data_nodes=BODY_25_SKELETON,
                              input_nodes=CARLA_SKELETON, transform="none")
    raw = _raw(BODY_25_SKELETON)
    inputs, targets = process_batch(KEY, raw, cfg)
    assert inputs.shape == (B, L, len(CARLA_SKELETON), 2)
    in_idx, data_idx = get_common_indices(BODY_25_SKELETON, CARLA_SKELETON)
    got = np.asarray(inputs)
    np.testing.assert_allclose(got[..., np.asarray(in_idx), :],
                               np.asarray(raw)[..., np.asarray(data_idx), :])
    uncommon = sorted(set(range(len(CARLA_SKELETON))) - set(in_idx))
    np.testing.assert_allclose(got[..., np.asarray(uncommon), :], 0.0)
    # targets stay in the data skeleton? No — targets with a J_data axis are
    # remapped too (remapped_targets), matching the model's input skeleton
    assert targets["projection_2d"].shape[-2] == len(CARLA_SKELETON)


def test_confidence_channel_is_presence_mask():
    J = len(CARLA_SKELETON)
    missing = [0.0] * J
    missing[3] = 1.0
    cfg = PreprocessingConfig(data_nodes=CARLA_SKELETON,
                              input_nodes=CARLA_SKELETON, transform="none",
                              missing_joint_probabilities=tuple(missing),
                              needs_confidence=True)
    inputs, _ = process_batch(KEY, _raw(), cfg)
    assert inputs.shape[-1] == 3
    conf = np.asarray(inputs[..., 2])
    np.testing.assert_allclose(conf[:, :, 3], 0.0)   # missing joint -> 0
    assert (conf[:, :, 0] == 1.0).all()              # present joint -> 1


def test_confidence_channel_stripped_when_not_needed():
    cfg = PreprocessingConfig(data_nodes=CARLA_SKELETON,
                              input_nodes=CARLA_SKELETON, transform="none",
                              has_confidence_channel=True)
    raw = _raw(channels=3)
    inputs, _ = process_batch(KEY, raw, cfg)
    assert inputs.shape[-1] == 2


def test_augmentation_carries_to_ground_truth():
    cfg = PreprocessingConfig(data_nodes=CARLA_SKELETON,
                              input_nodes=CARLA_SKELETON, transform="none",
                              augment_flip=1.0)
    raw = _raw()
    clip_size = jnp.asarray([800.0, 600.0])
    inputs, targets = process_batch(KEY, raw, cfg, True,
                                    clip_size=clip_size)
    # flip applied to BOTH inputs and the clean target (it IS the new truth)
    np.testing.assert_allclose(np.asarray(inputs),
                               np.asarray(targets["projection_2d"]))
    assert np.asarray(targets["is_flipped"]).any()
    assert not np.allclose(np.asarray(inputs), np.asarray(raw))


def test_remap_nodes_same_skeleton_is_identity():
    cfg = PreprocessingConfig(data_nodes=CARLA_SKELETON,
                              input_nodes=CARLA_SKELETON)
    raw = _raw()
    assert remap_nodes(raw, cfg) is raw


def test_confidence_presence_survives_normalization():
    # Joint presence must be read off the pre-normalization coordinates:
    # dropped joints are exact (0,0) only before the shift/scale moves them.
    # Regression: with a transform active, dropped joints were marked
    # confident because the normalized coordinates are nonzero.
    J = len(CARLA_SKELETON)
    missing = [0.0] * J
    missing[3] = 1.0
    cfg = PreprocessingConfig(data_nodes=CARLA_SKELETON,
                              input_nodes=CARLA_SKELETON,
                              transform="hips_neck",
                              missing_joint_probabilities=tuple(missing),
                              needs_confidence=True)
    inputs, _ = process_batch(KEY, _raw(), cfg)
    conf = np.asarray(inputs[..., 2])
    np.testing.assert_allclose(conf[:, :, 3], 0.0)   # dropped joint -> 0
    assert (conf[:, :, 0] == 1.0).all()              # present joint -> 1


def test_shift_scale_not_remapped_when_clip_length_matches_joint_count():
    # (B, L, 2) shift/scale with L == len(data_nodes) must NOT be
    # joint-remapped (regression: the old shape heuristic gathered frames
    # as if they were joints).
    from pedestrians_video_2_carla_tpu.ops import normalization as N
    J = len(BODY_25_SKELETON)
    raw = 100.0 + 50.0 * jax.random.normal(jax.random.PRNGKey(2),
                                           (2, J, J, 2))  # clip_length == J
    cfg = PreprocessingConfig(data_nodes=BODY_25_SKELETON,
                              input_nodes=CARLA_SKELETON,
                              transform="hips_neck")
    _, targets = process_batch(KEY, raw, cfg)
    _, ss = N.normalize_with(raw, BODY_25_SKELETON, extractor="hips_neck")
    np.testing.assert_allclose(np.asarray(targets["projection_2d_shift"]),
                               np.asarray(ss.shift), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(targets["projection_2d_scale"]),
                               np.asarray(ss.scale), rtol=1e-6)
