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
