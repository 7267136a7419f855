import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.losses import (LossContext, LossModes,
                                                  calculate_losses,
                                                  primary_loss,
                                                  resolve_loss_modes)
from pedestrians_video_2_carla_tpu.skeletons import BODY_25_SKELETON, CARLA_SKELETON


def test_resolve_prepends_dependencies():
    modes = resolve_loss_modes([LossModes.loc_2d_3d])
    assert modes == [LossModes.loc_2d, LossModes.loc_3d, LossModes.loc_2d_3d]
    # dedup keeps first occurrence
    modes = resolve_loss_modes([LossModes.loc_2d, LossModes.loc_2d_3d])
    assert modes == [LossModes.loc_2d, LossModes.loc_3d, LossModes.loc_2d_3d]


def _ctx(sliced, targets, **kw):
    return LossContext(input_nodes=CARLA_SKELETON, output_nodes=CARLA_SKELETON,
                       sliced=sliced, targets=targets, **kw)


def test_loc_2d_perfect_prediction_is_zero(rng):
    proj = jnp.asarray(rng.normal(size=(2, 3, 26, 2)).astype(np.float32))
    ctx = _ctx({"projection_2d": proj}, {"projection_2d": proj})
    losses = calculate_losses([LossModes.loc_2d], [LossModes.loc_2d], ctx)
    assert float(losses["loc_2d"]) == 0.0


def test_loc_2d_missing_joints_are_masked(rng):
    gt = np.abs(rng.normal(size=(2, 3, 26, 2))).astype(np.float32) + 1.0
    pred = gt.copy()
    gt[:, :, 5] = 0.0        # joint 5 missing in GT
    pred[:, :, 5] = 100.0    # prediction wildly off there
    ctx = _ctx({"projection_2d": jnp.asarray(pred)},
               {"projection_2d": jnp.asarray(gt)})
    losses = calculate_losses([LossModes.loc_2d], [LossModes.loc_2d], ctx)
    assert float(losses["loc_2d"]) == 0.0  # masked out

    ctx = _ctx({"projection_2d": jnp.asarray(pred)},
               {"projection_2d": jnp.asarray(gt)}, mask_missing_joints=False)
    losses = calculate_losses([LossModes.loc_2d], [LossModes.loc_2d], ctx)
    assert float(losses["loc_2d"]) > 0.0


def test_composite_loss_sums_components(rng):
    proj = jnp.asarray(rng.normal(size=(2, 3, 26, 2)).astype(np.float32))
    abs_loc = jnp.asarray(rng.normal(size=(2, 3, 26, 3)).astype(np.float32))
    sliced = {"projection_2d": proj + 1.0, "absolute_pose_loc": abs_loc + 1.0}
    targets = {"projection_2d": proj, "absolute_pose_loc": abs_loc}
    modes = resolve_loss_modes([LossModes.loc_2d_3d])
    ctx = _ctx(sliced, targets, mask_missing_joints=False)
    losses = calculate_losses(modes, [LossModes.loc_2d_3d], ctx)
    np.testing.assert_allclose(
        float(losses["loc_2d_3d"]),
        float(losses["loc_2d"]) + float(losses["loc_3d"]), rtol=1e-6)
    name, value = primary_loss(losses, [LossModes.loc_2d_3d])
    assert name == "loc_2d_3d"


def test_weighted_composite(rng):
    proj = jnp.ones((1, 2, 26, 2))
    abs_loc = jnp.ones((1, 2, 26, 3))
    rot = jnp.zeros((1, 2, 26, 3, 3))
    sliced = {"projection_2d": proj * 2, "absolute_pose_loc": abs_loc * 2,
              "absolute_pose_rot": rot + 1}
    targets = {"projection_2d": proj, "absolute_pose_loc": abs_loc,
               "absolute_pose_rot": rot}
    modes = resolve_loss_modes([LossModes.weighted_loc_2d_loc_rot_3d])
    ctx = _ctx(sliced, targets, mask_missing_joints=False,
               loss_weights={"loc_2d": 0.0, "loc_3d": 0.0, "rot_3d": 2.0})
    losses = calculate_losses(modes, [LossModes.weighted_loc_2d_loc_rot_3d],
                              ctx)
    np.testing.assert_allclose(
        float(losses["weighted_loc_2d_loc_rot_3d"]),
        2.0 * float(losses["rot_3d"]), rtol=1e-6)


def test_missing_target_skips_loss_statically(rng):
    proj = jnp.asarray(rng.normal(size=(1, 2, 26, 2)).astype(np.float32))
    # request loc_2d_3d but targets lack absolute_pose_loc -> only loc_2d
    modes = resolve_loss_modes([LossModes.loc_2d_3d, LossModes.loc_2d])
    ctx = _ctx({"projection_2d": proj}, {"projection_2d": proj})
    losses = calculate_losses(modes, [LossModes.loc_2d_3d, LossModes.loc_2d],
                              ctx)
    assert "loc_3d" not in losses and "loc_2d_3d" not in losses
    name, _ = primary_loss(losses, [LossModes.loc_2d_3d, LossModes.loc_2d])
    assert name == "loc_2d"


def test_pose_changes_and_cum_pose_changes(rng):
    changes = jnp.asarray(
        rng.normal(size=(2, 4, 26, 3, 3)).astype(np.float32))
    ctx = _ctx({"pose_inputs": changes}, {"pose_changes": changes})
    losses = calculate_losses(
        resolve_loss_modes([LossModes.pose_changes]),
        [LossModes.pose_changes], ctx)
    assert float(losses["pose_changes"]) == 0.0
    losses = calculate_losses(
        resolve_loss_modes([LossModes.cum_pose_changes]),
        [LossModes.cum_pose_changes], ctx)
    assert float(losses["cum_pose_changes"]) < 1e-8


def test_cum_pose_changes_matches_matmul_reference(rng):
    """The component-plane rewrite must equal the direct matrix-product
    formulation (earlier-frame @ later-frame running product)."""
    from pedestrians_video_2_carla_tpu.losses import loss_cum_pose_changes
    from tests.ops.np_reference import random_rotation_matrices

    pred = jnp.asarray(random_rotation_matrices(rng, (2, 5, 6))
                       .astype(np.float32))
    gt = jnp.asarray(random_rotation_matrices(rng, (2, 5, 6))
                     .astype(np.float32))
    got = float(loss_cum_pose_changes(
        _ctx({"pose_inputs": pred}, {"pose_changes": gt})))

    def cum(m):
        out = [np.asarray(m[:, 0])]
        for t in range(1, m.shape[1]):
            out.append(out[-1] @ np.asarray(m[:, t]))
        return np.stack(out, axis=1)

    want = float(np.mean((cum(pred) - cum(gt)) ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_per_joint_weights_gathered_at_input_indices(rng):
    """Per-joint weights are per-INPUT-skeleton node and gathered at the
    (non-contiguous) common input indices, like the reference's
    self._weights[..., self._input_indices]."""
    from pedestrians_video_2_carla_tpu.losses import loss_per_joint_loc_2d
    from pedestrians_video_2_carla_tpu.skeletons.base import \
        get_common_indices

    pred = jnp.asarray(rng.normal(size=(1, 2, 26, 2)).astype(np.float32))
    gt = jnp.asarray(rng.normal(size=(1, 2, 25, 2)).astype(np.float32))
    out_idx, in_idx = get_common_indices(BODY_25_SKELETON, CARLA_SKELETON)
    # weight vector over ALL 25 BODY_25 nodes: zero everywhere except one
    # common joint -> the loss must reduce to that single joint's MSE
    j_common = 3  # position within the common-joint axis
    w = [0.0] * 25
    w[list(in_idx)[j_common]] = 1.0
    ctx = LossContext(input_nodes=BODY_25_SKELETON,
                      output_nodes=CARLA_SKELETON,
                      sliced={"projection_2d": pred},
                      targets={"projection_2d": gt},
                      loss_params=w, mask_missing_joints=False)
    got = float(loss_per_joint_loc_2d(ctx))
    want = float(np.mean((np.asarray(pred)[..., out_idx, :][..., j_common, :]
                          - np.asarray(gt)[..., in_idx, :][..., j_common, :])
                         ** 2))
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_heatmaps_loss_masks_missing_joint_channels(rng):
    """All-zero GT heatmap channels (missing joints) are excluded from the
    loss, like every BasePoseLoss subclass in the reference."""
    from pedestrians_video_2_carla_tpu.losses import loss_heatmaps

    pred = jnp.asarray(rng.normal(size=(1, 2, 4, 8, 8)).astype(np.float32))
    gt = np.abs(rng.normal(size=(1, 2, 4, 8, 8))).astype(np.float32)
    gt[:, :, 1] = 0.0  # channel 1 = missing joint
    ctx = _ctx({"heatmaps": pred}, {"heatmaps": jnp.asarray(gt)})
    got = float(loss_heatmaps(ctx))
    sq = (np.asarray(pred) - gt) ** 2
    keep = sq[:, :, [0, 2, 3]]  # masked channel excluded
    want = float(np.sum(np.mean(np.mean(keep, axis=(2, 3, 4)), axis=0)))
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # and the masked loss differs from the unmasked one
    ctx_unmasked = _ctx({"heatmaps": pred}, {"heatmaps": jnp.asarray(gt)})
    ctx_unmasked.mask_missing_joints = False
    assert abs(float(loss_heatmaps(ctx_unmasked)) - got) > 1e-6


def test_cross_skeleton_loss_uses_common_joints(rng):
    # predictions on CARLA (26), GT on BODY_25 (25) -> 21 common joints
    pred = jnp.asarray(rng.normal(size=(1, 2, 26, 2)).astype(np.float32))
    gt = np.zeros((1, 2, 25, 2), dtype=np.float32)
    ctx = LossContext(input_nodes=BODY_25_SKELETON,
                      output_nodes=CARLA_SKELETON,
                      sliced={"projection_2d": pred},
                      targets={"projection_2d": jnp.asarray(gt)},
                      mask_missing_joints=False)
    losses = calculate_losses([LossModes.loc_2d], [LossModes.loc_2d], ctx)
    assert float(losses["loc_2d"]) > 0


def test_rotation_losses_unavailable_for_location_outputs(rng):
    """cum_pose_changes / pose_changes must statically declare themselves
    unavailable when pose_inputs are locations (absolute_loc models like
    PoseFormer), not crash on shape mismatch (r3 regression: the reference's
    support matrix skips these combos, tests/fixtures/flow.py:27-59)."""
    from pedestrians_video_2_carla_tpu.losses import (loss_cum_pose_changes,
                                                      loss_pose_changes)
    locs = jnp.asarray(rng.normal(size=(2, 8, 26, 3)).astype(np.float32))
    changes = jnp.asarray(
        np.broadcast_to(np.eye(3, dtype=np.float32), (2, 8, 26, 3, 3)))
    ctx = LossContext(input_nodes=CARLA_SKELETON,
                      output_nodes=CARLA_SKELETON,
                      sliced={"pose_inputs": locs},
                      targets={"pose_changes": changes})
    assert loss_cum_pose_changes(ctx) is None
    assert loss_pose_changes(ctx) is None
    # and still available for genuine rotation-matrix outputs
    ctx_rot = LossContext(input_nodes=CARLA_SKELETON,
                          output_nodes=CARLA_SKELETON,
                          sliced={"pose_inputs": changes},
                          targets={"pose_changes": changes})
    assert float(loss_cum_pose_changes(ctx_rot)) == 0.0
    assert float(loss_pose_changes(ctx_rot)) == 0.0
