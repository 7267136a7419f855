"""RL environment surface (reference ``gym_carla_pedestrians/``, SURVEY
§2.11): env reset/step contract, flat-array action adapter, and render
wrappers — all on the mock carla client (no server needed)."""
import numpy as np
import pytest

gym = pytest.importorskip("gymnasium")

from pedestrians_video_2_carla_tpu.gym_carla_pedestrians.envs import \
    CarlaPedestriansEnv
from pedestrians_video_2_carla_tpu.gym_carla_pedestrians.wrappers import (
    CarlaRenderWrapper, NumpyToDictActionWrapper, PoseOverlayRenderWrapper)
from pedestrians_video_2_carla_tpu.skeletons.carla import BONE_NAMES


def _zero_action(env):
    return {
        "teleport_by": {
            "location": np.zeros(3, np.float32),
            "rotation": np.zeros(1, np.float32),
        },
        "update_pose": {b: np.zeros(3, np.float32) for b in BONE_NAMES},
    }


def test_reset_returns_observation_in_space():
    env = CarlaPedestriansEnv()
    obs, info = env.reset(seed=0)
    assert set(obs) == {"relative_pose", "absolute_pose", "pose_projection"}
    assert obs["pose_projection"].shape == (26, 2)
    assert set(obs["relative_pose"]) == set(BONE_NAMES)
    loc = obs["relative_pose"]["crl_hips__C"]["location"]
    assert loc.shape == (3,) and loc.dtype == np.float32
    assert info == {}


def test_step_contract_and_termination():
    env = CarlaPedestriansEnv()
    env.reset(seed=0, options={"length": 2})
    obs, reward, terminated, truncated, info = env.step(_zero_action(env))
    assert reward == 0.0 and not terminated and not truncated
    assert "pedestrian" in info and "pose_projection" in info
    _, _, terminated, truncated, _ = env.step(_zero_action(env))
    assert terminated and not truncated  # reached options["length"]


def test_pose_update_moves_projection():
    env = CarlaPedestriansEnv()
    obs0, _ = env.reset(seed=0)
    action = _zero_action(env)
    action["update_pose"]["crl_arm__L"] = np.asarray([0.0, 0.0, 18.0],
                                                     np.float32)
    obs1, *_ = env.step(action)
    assert not np.allclose(obs0["pose_projection"], obs1["pose_projection"])
    # rotating one arm must not move the hips root
    assert np.allclose(
        obs0["absolute_pose"]["crl_hips__C"]["location"],
        obs1["absolute_pose"]["crl_hips__C"]["location"])


def test_teleport_accumulates():
    env = CarlaPedestriansEnv()
    env.reset(seed=0)
    action = _zero_action(env)
    action["teleport_by"]["location"] = np.asarray([0.1, 0.0, 0.0],
                                                   np.float32)
    env.step(action)
    env.step(action)
    t = env.pedestrian.transform
    assert t.location.x == pytest.approx(0.2, abs=1e-6)


def test_numpy_action_wrapper_maps_rows():
    env = NumpyToDictActionWrapper(CarlaPedestriansEnv())
    env.reset(seed=0)
    flat = np.zeros((2 + len(BONE_NAMES), 3), np.float32)
    flat[0] = [0.05, 0.0, 0.0]          # teleport location
    flat[1] = [10.0, 45.0, -3.0]        # only yaw (col 1) is used
    flat[2 + BONE_NAMES.index("crl_spine__C")] = [0.0, 0.0, 9.0]
    obs, *_ = env.step(flat)
    t = env.unwrapped.pedestrian.transform
    assert t.location.x == pytest.approx(0.05, abs=1e-6)
    assert t.rotation.yaw == pytest.approx(45.0, abs=1e-6)
    spine = env.unwrapped.pedestrian.current_pose.relative["crl_spine__C"]
    assert spine.rotation.roll != 0.0


def test_render_wrappers_produce_overlay_frame():
    env = PoseOverlayRenderWrapper(CarlaRenderWrapper(CarlaPedestriansEnv()))
    assert "rgb_array" in env.metadata["render_modes"]
    env.reset(seed=0)
    frame = env.render()
    assert frame is not None and frame.shape == (600, 800, 3)
    assert frame.any()  # the skeleton overlay drew non-black pixels
    env.step(_zero_action(env))
    frame2 = env.render()
    assert frame2.any()
    env.close()
