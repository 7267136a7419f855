"""Serving export (serving.py): the serialized StableHLO artifact must
reproduce the flow's eval-path predictions exactly, reload without the model
class, and reject wrong shapes (static-shape serving contract)."""
import numpy as np
import jax
import pytest

from pedestrians_video_2_carla_tpu.serving import (export_inference,
                                                   load_inference,
                                                   make_inference_fn)


@pytest.fixture(scope="module")
def lifting_setup():
    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import \
        MOVEMENTS_MODELS

    cfg = Carla2D3DConfig(batch_size=4, clip_length=8)
    batch = jax.tree_util.tree_map(
        np.asarray, generate_batch(jax.random.PRNGKey(0), cfg))
    flow = PoseLiftingFlow(
        movements_model=MOVEMENTS_MODELS["LinearAE"](),
        loss_modes=[LossModes.loc_2d],
        movements_optimizer=OptimizerSettings(lr=1e-3))
    state = flow.init_state(jax.random.PRNGKey(1), batch)
    return flow, state, batch


def test_export_roundtrip_matches_direct(lifting_setup, tmp_path):
    flow, state, batch = lifting_setup
    inputs, _, meta = batch
    agi = np.asarray(meta["age_gender_idx"])

    direct = jax.jit(make_inference_fn(flow, state))(inputs, agi)
    path = export_inference(flow, state, inputs, agi,
                            str(tmp_path / "model.jaxexp"))
    call, info = load_inference(path)
    served = call(inputs, agi)

    assert set(served) == set(direct)
    assert "projection_2d" in served and "absolute_pose_loc" in served
    for k in direct:
        np.testing.assert_allclose(np.asarray(served[k]),
                                   np.asarray(direct[k]),
                                   atol=1e-6, err_msg=k)
    assert info["flow"] == "PoseLiftingFlow"
    assert sorted(direct) == info["output_keys"]


def test_export_output_keys_and_pallas_kernel(lifting_setup, tmp_path):
    """--export_keys filtering + the lean 2D-only Pallas-kernel artifact
    (--projection_kernel pallas): filtered outputs match the full XLA
    artifact's projection_2d; unknown keys fail loudly."""
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import \
        MOVEMENTS_MODELS

    flow, state, batch = lifting_setup
    inputs, _, meta = batch
    agi = np.asarray(meta["age_gender_idx"])
    direct = jax.jit(make_inference_fn(flow, state))(inputs, agi)

    flow_pal = PoseLiftingFlow(
        movements_model=MOVEMENTS_MODELS["LinearAE"](),
        loss_modes=[LossModes.loc_2d],
        movements_optimizer=OptimizerSettings(lr=1e-3),
        projection_kernel="pallas")
    path = export_inference(flow_pal, state, inputs, agi,
                            str(tmp_path / "lean.jaxexp"),
                            output_keys=("projection_2d",))
    call, info = load_inference(path)
    served = call(inputs, agi)
    assert set(served) == {"projection_2d"}
    assert info["output_keys"] == ["projection_2d"]
    np.testing.assert_allclose(np.asarray(served["projection_2d"]),
                               np.asarray(direct["projection_2d"]),
                               rtol=1e-5, atol=1e-4)

    with pytest.raises(KeyError, match="not produced"):
        make_inference_fn(flow, state, output_keys=("nope",))(inputs, agi)


def test_export_polymorphic_batch(lifting_setup, tmp_path):
    """polymorphic_batch=True: ONE artifact serves any batch size (symbolic
    leading dim via jax.export shape polymorphism) and matches the direct
    eval path at sizes never seen at export time."""
    flow, state, batch = lifting_setup
    inputs, _, meta = batch
    agi = np.asarray(meta["age_gender_idx"])

    path = export_inference(flow, state, inputs, agi,
                            str(tmp_path / "poly.jaxexp"),
                            polymorphic_batch=True)
    call, info = load_inference(path)
    assert info["input_shapes"][0][0] == "b"

    direct_fn = jax.jit(make_inference_fn(flow, state))
    for bs in (1, 3, 4):
        served = call(inputs[:bs], agi[:bs])
        direct = direct_fn(inputs[:bs], agi[:bs])
        for k in direct:
            np.testing.assert_allclose(np.asarray(served[k]),
                                       np.asarray(direct[k]),
                                       atol=1e-5, err_msg=f"{k} @ B={bs}")

    # the Pallas kernels specialize their grid on the batch size -> refuse
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import \
        MOVEMENTS_MODELS
    flow_pal = PoseLiftingFlow(
        movements_model=MOVEMENTS_MODELS["LinearAE"](),
        loss_modes=[LossModes.loc_2d],
        movements_optimizer=OptimizerSettings(lr=1e-3),
        projection_kernel="pallas")
    with pytest.raises(ValueError, match="polymorphic_batch"):
        export_inference(flow_pal, state, inputs, agi,
                         str(tmp_path / "nope.jaxexp"),
                         polymorphic_batch=True)


def test_export_rejects_wrong_shape(lifting_setup, tmp_path):
    flow, state, batch = lifting_setup
    inputs, _, meta = batch
    agi = np.asarray(meta["age_gender_idx"])
    path = export_inference(flow, state, inputs, agi,
                            str(tmp_path / "model.jaxexp"))
    call, _ = load_inference(path)
    with pytest.raises(Exception):
        jax.jit(call)(inputs[:, :4], agi)  # wrong clip length


def test_export_classification_flow(tmp_path):
    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.classification import \
        ClassificationFlow
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.classification import \
        CLASSIFICATION_MODELS

    cfg = Carla2D3DConfig(batch_size=4, clip_length=6)
    inputs, targets, meta = jax.tree_util.tree_map(
        np.asarray, generate_batch(jax.random.PRNGKey(0), cfg))
    batch = (inputs, {**targets,
                      "crossing": np.asarray([0, 1, 1, 0], np.int32)}, meta)
    flow = ClassificationFlow(
        classification_model=CLASSIFICATION_MODELS["LSTM"](),
        classification_optimizer=OptimizerSettings(lr=1e-3))
    state = flow.init_state(jax.random.PRNGKey(1), batch)
    agi = np.asarray(meta["age_gender_idx"])

    path = export_inference(flow, state, inputs, agi,
                            str(tmp_path / "clf.jaxexp"))
    call, _ = load_inference(path)
    served = call(inputs, agi)
    direct = jax.jit(make_inference_fn(flow, state))(inputs, agi)
    np.testing.assert_allclose(
        np.asarray(served["crossing_logits"]),
        np.asarray(direct["crossing_logits"]), atol=1e-6)
