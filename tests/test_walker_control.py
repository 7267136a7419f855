"""Walker-control layer tests, mirroring the reference's
tests/walker_control/* equivalence strategy: the CARLA-dict ``Pose`` must
agree with the tensor path bone-by-bone."""
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.skeletons.carla import (
    BONE_NAMES, CARLA_SKELETON, load_reference_pose)
from pedestrians_video_2_carla_tpu.walker_control.carla_utils import carla
from pedestrians_video_2_carla_tpu.walker_control.controlled_pedestrian import \
    ControlledPedestrian
from pedestrians_video_2_carla_tpu.walker_control.pose import (
    Pose, load_reference_pose_dict)
from pedestrians_video_2_carla_tpu.walker_control.pose_projection import (
    PoseProjection, RGBCameraMock)


@pytest.fixture
def reference_pose():
    p = Pose()
    p.relative, _ = load_reference_pose_dict("adult", "female")
    return p


def test_pose_relative_roundtrip(reference_pose):
    rel = reference_pose.relative
    assert len(rel) == 26
    assert abs(rel["crl_hips__C"].location.x) < 1e-9  # re-zeroed hips


def test_pose_absolute_matches_tensor_fk(reference_pose):
    """CARLA-dict FK == tensor FK (the reference pins Pose vs P3dPose the
    same way, tests/walker_control/test_p3d_pose.py:21-56)."""
    from pedestrians_video_2_carla_tpu.ops.kinematics import forward_kinematics
    from pedestrians_video_2_carla_tpu.ops.rotations import (
        matrix_to_carla_rotation, p3d_location_to_carla)

    absolute = reference_pose.absolute
    rel_loc, rel_rot = load_reference_pose("adult_female")
    abs_loc, abs_rot = forward_kinematics(rel_loc, rel_rot)
    carla_loc = np.asarray(p3d_location_to_carla(abs_loc))
    carla_rot = np.asarray(matrix_to_carla_rotation(abs_rot))

    for i, name in enumerate(BONE_NAMES):
        t = absolute[name]
        np.testing.assert_allclose(
            [t.location.x, t.location.y, t.location.z], carla_loc[i],
            atol=1e-3, err_msg=name)
        diff = (np.asarray([t.rotation.pitch, t.rotation.yaw,
                            t.rotation.roll]) - carla_rot[i] + 180) % 360 - 180
        np.testing.assert_allclose(diff, 0, atol=0.1, err_msg=name)


def test_pose_move_matches_tensor_move(reference_pose):
    """Pose.move == tensor move+FK (reference test_p3d_pose equivalence)."""
    from pedestrians_video_2_carla_tpu.ops.kinematics import (
        forward_kinematics, move)
    from pedestrians_video_2_carla_tpu.ops.rotations import (
        carla_rotation_to_matrix, p3d_location_to_carla)
    import jax.numpy as jnp

    change = {"crl_arm__L": carla.Rotation(yaw=-30.0)}
    reference_pose.move(change)
    absolute = reference_pose.absolute

    rel_loc, rel_rot = load_reference_pose("adult_female")
    changes = np.broadcast_to(np.eye(3, dtype=np.float32),
                              (26, 3, 3)).copy()
    changes[int(CARLA_SKELETON.crl_arm__L)] = np.asarray(
        carla_rotation_to_matrix(jnp.asarray([0.0, -30.0, 0.0])))
    new_rel = np.asarray(move(jnp.asarray(changes), jnp.asarray(rel_rot)))
    abs_loc, _ = forward_kinematics(rel_loc, new_rel)
    carla_loc = np.asarray(p3d_location_to_carla(abs_loc))

    hand = BONE_NAMES.index("crl_hand__L")
    t = absolute["crl_hand__L"]
    np.testing.assert_allclose(
        [t.location.x, t.location.y, t.location.z], carla_loc[hand],
        atol=1e-3)


def test_controlled_pedestrian_unbound():
    p = ControlledPedestrian(None, "adult", "female")
    assert p.age == "adult" and p.walker is None
    before = p.current_pose.absolute["crl_hand__L"].location.y
    p.update_pose({"crl_arm__L": carla.Rotation(yaw=-45.0)})
    after = p.current_pose.absolute["crl_hand__L"].location.y
    assert before != after
    # teleports accumulate into the world transform without a walker
    p.teleport_by(carla.Transform(location=carla.Location(x=1.0)))
    p.teleport_by(carla.Transform(location=carla.Location(x=0.5)))
    assert p.transform.location.x == pytest.approx(1.5)


def test_bind_raises_with_mock_carla():
    p = ControlledPedestrian(None, "adult", "female")
    with pytest.raises(RuntimeError):
        p.bind(object())


def test_pose_projection_matches_reference_projection():
    from pedestrians_video_2_carla_tpu.ops.reference_skeletons import \
        reference_projections
    p = ControlledPedestrian(None, "adult", "female")
    proj = PoseProjection(p, camera_position=(3.1, 0, 0), look_at=(0, 0, 0))
    pts = proj.current_pose_to_points()
    assert pts.shape == (26, 2)
    expected = reference_projections()[0, :, :2]
    np.testing.assert_allclose(pts, expected, atol=0.5)


def test_gym_env_smoke():
    gym = pytest.importorskip("gymnasium")
    from pedestrians_video_2_carla_tpu.gym_carla_pedestrians import \
        CarlaPedestriansEnv
    env = CarlaPedestriansEnv(env_id=0)
    obs, info = env.reset(seed=0, options={"length": 2})
    assert obs["pose_projection"].shape == (26, 2)
    action = env.action_space.sample()
    obs, reward, terminated, truncated, info = env.step(action)
    assert reward == 0.0 and not terminated
    obs, reward, terminated, truncated, info = env.step(action)
    assert terminated


def test_points_renderer_draws_skeleton():
    from pedestrians_video_2_carla_tpu.ops.reference_skeletons import \
        reference_projections
    from pedestrians_video_2_carla_tpu.renderers.points_renderer import \
        PointsRenderer
    pts = reference_projections()[0, :, :2]
    renderer = PointsRenderer(CARLA_SKELETON)
    frame = renderer.render_frame(pts)
    assert frame.shape == (600, 800, 3)
    assert (frame.sum(-1) > 0).sum() > 100  # something was drawn


def test_pedestrian_writer_mp4(tmp_path):
    from pedestrians_video_2_carla_tpu.loggers.pedestrian_writer import \
        PedestrianWriter
    from pedestrians_video_2_carla_tpu.ops.reference_skeletons import \
        reference_projections
    ref = reference_projections()[:1, None, :, :2]  # (1, 1, 26, 2)
    clip = np.broadcast_to(ref, (2, 4, 26, 2))
    writer = PedestrianWriter(str(tmp_path), renderers=["input_points"],
                              max_videos=2)
    paths = writer.log_videos(
        inputs=clip, targets={}, projections={},
        meta={"age_gender_idx": np.zeros(2, np.int32)},
        step=0, stage="val", normalized=False, force=True)
    assert len(paths) == 2
    assert all(p.endswith(".mp4") for p in paths)
    import os
    assert all(os.path.getsize(p) > 1000 for p in paths)


# -- SMPL mesh path (body model LBS + software rasterizer) -------------------

def _write_tiny_body_model(dirpath):
    """Synthetic 3-joint / 5-vertex SMPL-format npz for mesh-path tests."""
    import os

    import numpy as np

    J, V = 3, 5
    v_template = np.asarray([
        [0.0, 0.0, 0.0], [0.1, 0.0, 0.5], [-0.1, 0.0, 0.5],
        [0.1, 0.0, 1.0], [-0.1, 0.0, 1.0]], np.float64)
    # joints at z = 0, 0.5, 1.0 regressed from nearby vertices
    j_regressor = np.zeros((J, V))
    j_regressor[0, 0] = 1.0
    j_regressor[1, 1] = j_regressor[1, 2] = 0.5
    j_regressor[2, 3] = j_regressor[2, 4] = 0.5
    kintree = np.asarray([[2**32 - 1, 0, 1], [0, 1, 2]], np.int64)
    weights = np.zeros((V, J))
    weights[0, 0] = 1.0
    weights[1, 1] = weights[2, 1] = 1.0
    weights[3, 2] = weights[4, 2] = 1.0
    faces = np.asarray([[0, 1, 2], [1, 3, 4], [1, 4, 2]], np.int64)
    os.makedirs(os.path.join(dirpath, "neutral"), exist_ok=True)
    np.savez(os.path.join(dirpath, "neutral", "model.npz"),
             v_template=v_template, J_regressor=j_regressor,
             kintree_table=kintree, weights=weights, f=faces)


def test_smpl_vertex_locations_identity_pose(tmp_path):
    import jax.numpy as jnp
    import numpy as np

    from pedestrians_video_2_carla_tpu.data.smpl.body_model import (
        load_body_model_npz, vertex_locations)

    _write_tiny_body_model(tmp_path)
    model = load_body_model_npz(str(tmp_path / "neutral" / "model.npz"))
    assert model.skin_weights is not None and model.faces is not None
    verts = vertex_locations(model, jnp.zeros(((len(model.parents) - 1) * 3,)))
    np.testing.assert_allclose(np.asarray(verts), model.v_template, atol=1e-5)


def test_smpl_vertex_locations_rotation_moves_children(tmp_path):
    """Rotating the mid joint 90 deg about x must move the top vertices."""
    import jax.numpy as jnp
    import numpy as np

    from pedestrians_video_2_carla_tpu.data.smpl.body_model import (
        load_body_model_npz, vertex_locations)

    _write_tiny_body_model(tmp_path)
    model = load_body_model_npz(str(tmp_path / "neutral" / "model.npz"))
    pose = np.zeros((2, 3), np.float32)
    pose[0] = [np.pi / 2, 0.0, 0.0]   # joint 1 (first non-root)
    verts = np.asarray(vertex_locations(model, jnp.asarray(pose.reshape(-1))))
    base = np.asarray(model.v_template)
    # root-weighted vertex unchanged; joint-1/2-weighted vertices move
    np.testing.assert_allclose(verts[0], base[0], atol=1e-5)
    assert np.abs(verts[3] - base[3]).max() > 0.2


def test_smpl_renderer_mesh_path(tmp_path):
    import numpy as np

    from pedestrians_video_2_carla_tpu.renderers.smpl_renderer import \
        SMPLRenderer

    _write_tiny_body_model(tmp_path)
    r = SMPLRenderer(body_model_dir=str(tmp_path), image_size=(160, 120))
    pose = np.zeros((2, 3, 6), np.float32)   # (B=2, L=3, (J-1)*3)
    frames = list(r.render(amass_body_pose=pose,
                           meta={"gender": ["neutral", "neutral"]}))
    assert len(frames) == 2
    assert frames[0].shape == (3, 120, 160, 3)
    assert frames[0].sum() > 0               # mesh actually drawn


def test_smpl_renderer_skeleton_fallback():
    import numpy as np

    from pedestrians_video_2_carla_tpu.renderers.smpl_renderer import \
        SMPLRenderer

    r = SMPLRenderer(image_size=(160, 120))  # no body models on disk
    proj = np.full((1, 3, 22, 2), 60.0, np.float32)
    frames = list(r.render(amass_body_pose=np.zeros((1, 3, 63), np.float32),
                           projection_2d=proj, meta={}))
    assert len(frames) == 1 and frames[0].shape[0] == 3


def test_gym_wrappers_numpy_action_and_overlay_render():
    """Wrapper stack (reference ``gym_carla_pedestrians/wrappers/``): flat
    (28, 3) actions + rgb_array rendering with skeleton overlay."""
    import numpy as np
    import pytest
    pytest.importorskip("gymnasium")

    from pedestrians_video_2_carla_tpu.gym_carla_pedestrians import (
        CarlaPedestriansEnv, CarlaRenderWrapper, NumpyToDictActionWrapper,
        PoseOverlayRenderWrapper)

    env = NumpyToDictActionWrapper(
        PoseOverlayRenderWrapper(CarlaRenderWrapper(CarlaPedestriansEnv())))
    obs, info = env.reset(options={"length": 3})
    assert "pose_projection" in obs

    action = np.zeros((28, 3), np.float32)
    action[0] = [0.05, 0.0, 0.0]       # teleport forward
    action[1, 1] = 5.0                 # yaw
    action[4, :] = [10.0, 0.0, 0.0]    # bend a bone
    obs, reward, terminated, truncated, info = env.step(action)
    assert reward == 0.0 and not terminated

    frame = env.render()
    assert frame.shape == (600, 800, 3)
    assert (frame > 0).sum() > 50      # skeleton overlay drawn
    env.close()


def test_source_videos_renderer_overlays(tmp_path):
    """Source-video clips with bbox + skeleton overlays (reference
    ``pedestrian_writer.py:309-372``)."""
    import cv2
    import numpy as np

    from pedestrians_video_2_carla_tpu.renderers.source_videos_renderer import \
        SourceVideosRenderer
    from pedestrians_video_2_carla_tpu.skeletons.carla import CARLA_SKELETON

    # synthesize a 6-frame source video
    path = tmp_path / "video_0001.mp4"
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         10, (160, 120))
    for _ in range(6):
        vw.write(np.full((120, 160, 3), 30, np.uint8))
    vw.release()

    L, J = 3, 26
    pts = np.zeros((1, L, J, 2), np.float32)
    pts[..., 0] = np.linspace(40, 100, J)
    pts[..., 1] = np.linspace(20, 100, J)
    bboxes = np.zeros((1, L, 2, 2), np.float32)
    bboxes[:, :, 0] = [35, 15]
    bboxes[:, :, 1] = [105, 105]

    r = SourceVideosRenderer(source_videos_dir=str(tmp_path),
                             input_nodes=CARLA_SKELETON)
    clips = list(r.render(
        meta={"video_id": ["video_0001"], "start_frame": [2],
              "end_frame": [2 + L]},
        targets={"bboxes": bboxes}, input_points=pts, output_points=None))
    assert len(clips) == 1 and clips[0].shape == (L, 120, 160, 3)
    # overlays changed pixels vs the flat-gray source
    assert (clips[0] != 30).any(axis=-1).sum() > 100

    # missing video -> zero frames, not a crash
    clips = list(r.render(meta={"video_id": ["nope"], "start_frame": [0],
                                "end_frame": [L]}, targets={}))
    assert clips[0].sum() == 0


def test_writer_source_carla_renders(tmp_path):
    """source_carla = live-CARLA render of the SOURCE pose (reference
    ``pedestrian_writer.py:102-104``): with relative-pose targets it goes
    through CarlaRenderer (mock client -> black frames); without them it
    falls back to points-rendering the inputs."""
    from pedestrians_video_2_carla_tpu.loggers.pedestrian_writer import \
        PedestrianWriter
    from pedestrians_video_2_carla_tpu.ops.reference_skeletons import \
        reference_projections

    ref = reference_projections()[:1, None, :, :2]
    clip = np.asarray(np.broadcast_to(ref, (1, 3, 26, 2)))
    writer = PedestrianWriter(str(tmp_path), renderers=["source_carla"])
    meta = {"age_gender_idx": np.zeros(1, np.int32)}

    # with pose targets: CarlaRenderer under the mock client -> black frames
    targets = {
        "relative_pose_loc": np.zeros((1, 3, 26, 3), np.float32),
        "relative_pose_rot": np.broadcast_to(
            np.eye(3, dtype=np.float32), (1, 3, 26, 3, 3)).copy(),
    }
    frames = writer._render("source_carla", clip, targets, {}, meta,
                            normalized=False)
    assert len(frames) == 1 and frames[0].sum() == 0

    # without pose targets: falls back to points render of the inputs
    frames = writer._render("source_carla", clip, {}, {}, meta,
                            normalized=False)
    assert len(frames) == 1 and frames[0].sum() > 0


def test_source_videos_overlay_classes(tmp_path):
    """--source_videos_overlay_classes draws the label text (the reference
    left this as a TODO, ``pedestrian_writer.py:313-315``)."""
    import cv2

    from pedestrians_video_2_carla_tpu.renderers.source_videos_renderer import \
        SourceVideosRenderer

    path = tmp_path / "vid.mp4"
    vw = cv2.VideoWriter(str(path), cv2.VideoWriter_fourcc(*"mp4v"),
                         10, (160, 120))
    for _ in range(4):
        vw.write(np.full((120, 160, 3), 30, np.uint8))
    vw.release()

    meta = {"video_id": ["vid"], "start_frame": [0], "end_frame": [2]}
    kw = dict(source_videos_dir=str(tmp_path), overlay_skeletons=False,
              overlay_bboxes=False)
    plain = list(SourceVideosRenderer(**kw).render(
        meta=meta, targets={"crossing": np.asarray([1])}))
    labeled = list(SourceVideosRenderer(overlay_classes=True, **kw).render(
        meta=meta, targets={"crossing": np.asarray([1])}))
    # codec decode is not bit-exact, so compare labeled vs plain: the text
    # must change pixels in the top-left corner and nowhere else
    diff = (labeled[0].astype(int) - plain[0].astype(int)) != 0
    assert diff[:, :24, :120].any()             # text drawn top-left
    assert not diff[:, 40:].any()               # rest of the frame untouched
