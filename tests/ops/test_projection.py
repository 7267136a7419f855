import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.flows.output_types import (
    MovementsModelOutputType, TrajectoryModelOutputType)
from pedestrians_video_2_carla_tpu.ops.projection import (
    ProjectionModule, projection_state_for)
from pedestrians_video_2_carla_tpu.ops.rotations import eye_batch
from pedestrians_video_2_carla_tpu.skeletons import CARLA_SKELETON

B, L, J = 2, 5, 26


@pytest.fixture
def state():
    return projection_state_for(jnp.asarray([0, 1]))


def _identity_changes():
    return eye_batch((B, L, J), 3)


def test_pose_changes_projection(state):
    proj_module = ProjectionModule(MovementsModelOutputType.pose_changes)
    projections, outputs = proj_module(state, _identity_changes())
    assert projections.shape == (B, L, J, 3)
    assert outputs["absolute_pose_loc"].shape == (B, L, J, 3)
    assert outputs["absolute_pose_rot"].shape == (B, L, J, 3, 3)
    assert outputs["relative_pose_rot"].shape == (B, L, J, 3, 3)
    # identity changes => every frame identical
    p = np.asarray(projections)
    for t in range(1, L):
        np.testing.assert_allclose(p[:, t], p[:, 0], atol=1e-4)
    # all points visible in the 800x600 frame
    assert (p[..., 0] > 0).all() and (p[..., 0] < 800).all()
    assert (p[..., 1] > 0).all() and (p[..., 1] < 600).all()
    # different reference skeletons (adult vs male) produce different outputs
    assert not np.allclose(p[0], p[1])


def test_pose_changes_requires_5d(state):
    proj_module = ProjectionModule(MovementsModelOutputType.pose_changes)
    with pytest.raises(RuntimeError):
        proj_module(state, jnp.zeros((B, L, J, 3)))


def test_wrong_bone_count_raises(state):
    # the fk_planes gathers clamp out-of-bounds indices silently under jit;
    # a wrong J must fail loudly at trace time on both fused paths
    for mot in (MovementsModelOutputType.pose_changes,
                MovementsModelOutputType.relative_rot):
        with pytest.raises(RuntimeError, match="joints"):
            ProjectionModule(mot)(state, eye_batch((B, L, J - 1), 3))


def test_relative_rot_matches_pose_changes_identity(state):
    pm_changes = ProjectionModule(MovementsModelOutputType.pose_changes)
    pm_rel = ProjectionModule(MovementsModelOutputType.relative_rot)
    p1, o1 = pm_changes(state, _identity_changes())
    rel_rot_seq = o1["relative_pose_rot"]
    p2, o2 = pm_rel(state, rel_rot_seq)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=1e-4)


def test_absolute_loc_projection(state):
    pm = ProjectionModule(MovementsModelOutputType.pose_changes)
    _, outputs = pm(state, _identity_changes())
    abs_loc = outputs["absolute_pose_loc"]

    pm_abs = ProjectionModule(MovementsModelOutputType.absolute_loc)
    projections, out_abs = pm_abs(state, abs_loc)
    # feeding the true absolute pose back through autonormalize+denormalize
    # onto the same reference skeleton reproduces the projection
    p1 = np.asarray(pm(state, _identity_changes())[0])
    np.testing.assert_allclose(np.asarray(projections), p1, atol=0.5)
    assert out_abs["absolute_pose_rot"] is None


def test_world_track_changes_projection(state):
    pm = ProjectionModule(MovementsModelOutputType.pose_changes)
    dloc = jnp.zeros((B, L, 3)).at[:, :, 0].set(0.1)  # walk towards camera
    projections, outputs = pm(state, _identity_changes(), world_loc_inputs=dloc)
    depth = np.asarray(projections)[..., 2]
    # depth decreases every frame as the pedestrian approaches
    assert (np.diff(depth.mean(axis=-1), axis=1) < 0).all()
    np.testing.assert_allclose(
        np.asarray(outputs["world_loc"])[:, -1, 0], 0.1 * L, atol=1e-5)


def test_loc_rot_trajectory_passthrough(state):
    pm = ProjectionModule(MovementsModelOutputType.pose_changes,
                          TrajectoryModelOutputType.loc_rot)
    world_loc = jnp.ones((B, L, 3)) * 0.5
    projections, outputs = pm(state, _identity_changes(),
                              world_loc_inputs=world_loc)
    np.testing.assert_allclose(np.asarray(outputs["world_loc"]), 0.5)


def test_pallas_kernel_option_matches_xla(state):
    # kernel="pallas" (interpreted on CPU) must reproduce the XLA plane path
    # on the pose_changes + identity-world fast path, and silently fall back
    # to XLA when a world track makes the kernel inapplicable
    key = jax.random.PRNGKey(3)
    changes = np.asarray(eye_batch((B, L, J), 3)) \
        + 0.01 * jax.random.normal(key, (B, L, J, 3, 3))
    pm_xla = ProjectionModule(MovementsModelOutputType.pose_changes)
    pm_pal = ProjectionModule(MovementsModelOutputType.pose_changes,
                              kernel="pallas")
    p_ref, o_ref = pm_xla(state, changes)
    p_pal, o_pal = pm_pal(state, changes)
    np.testing.assert_allclose(np.asarray(p_pal), np.asarray(p_ref),
                               rtol=1e-5, atol=1e-4)
    # the 3D outputs dict stays on the XLA path either way
    np.testing.assert_allclose(np.asarray(o_pal["absolute_pose_loc"]),
                               np.asarray(o_ref["absolute_pose_loc"]),
                               atol=1e-6)
    # world track: pallas module falls back to the (world-aware) XLA path
    dloc = jnp.zeros((B, L, 3)).at[:, :, 0].set(0.1)
    p_w_ref, _ = pm_xla(state, changes, world_loc_inputs=dloc)
    p_w_pal, _ = pm_pal(state, changes, world_loc_inputs=dloc)
    np.testing.assert_allclose(np.asarray(p_w_pal), np.asarray(p_w_ref),
                               atol=1e-6)

    with pytest.raises(ValueError, match="kernel"):
        ProjectionModule(kernel="bogus")


def test_projection_is_jit_and_grad_compatible(state):
    pm = ProjectionModule(MovementsModelOutputType.pose_changes)

    @jax.jit
    def loss(changes):
        proj, _ = pm(state, changes)
        return jnp.mean(proj[..., :2] ** 2)

    g = jax.grad(loss)(_identity_changes())
    assert g.shape == (B, L, J, 3, 3)
    assert np.isfinite(np.asarray(g)).all()
