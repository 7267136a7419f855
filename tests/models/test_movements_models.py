"""Shape/grad smoke tests for every movements model (the reference covers the
model zoo through CLI smoke tests; here each model also gets a direct unit)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pedestrians_video_2_carla_tpu.flows.output_types import \
    MovementsModelOutputType as MOT
from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS

B, L, J = 2, 12, 26


def _init_and_apply(model, x, training=False, targets=None):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}
    variables = model.init(rngs, x, targets, training=training)
    mutable = [k for k in variables if k != "params"]
    if training and mutable:
        out, _ = model.apply(variables, x, targets, training=training,
                             rngs={"dropout": jax.random.PRNGKey(2)},
                             mutable=mutable)
    else:
        out = model.apply(variables, x, targets, training=training,
                          rngs={"dropout": jax.random.PRNGKey(2)})
    return out, variables


def _check_output(out, output_type, expected_joints=J, clip=L):
    if output_type in (MOT.pose_changes, MOT.relative_rot):
        assert out.shape == (B, clip, expected_joints, 3, 3)
        # valid rotations
        eye = np.einsum("...ij,...kj->...ik", np.asarray(out), np.asarray(out))
        np.testing.assert_allclose(
            eye, np.broadcast_to(np.eye(3), eye.shape), atol=1e-4)
    elif output_type == MOT.absolute_loc:
        assert out.shape == (B, clip, expected_joints, 3)
    elif output_type == MOT.absolute_loc_rot:
        loc, rot = out
        assert loc.shape == (B, clip, expected_joints, 3)
        assert rot.shape == (B, clip, expected_joints, 3, 3)
    elif output_type == MOT.pose_2d:
        assert out.shape == (B, clip, expected_joints, 2)


@pytest.mark.parametrize("name", sorted(MOVEMENTS_MODELS.keys()))
def test_model_forward_shapes(name, rng):
    cls = MOVEMENTS_MODELS[name]
    kwargs = {}
    if name.startswith("PoseFormer"):
        kwargs["clip_length"] = L
    model = cls(**kwargs)
    x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
    out, _ = _init_and_apply(model, x)
    if name.startswith("PoseFormer"):
        # edge frames outside the receptive-field coverage are zeros by
        # design and get trimmed by eval_slice — validate covered frames only
        es = model.eval_slice
        out = out[:, es] if not isinstance(out, tuple) \
            else tuple(o[:, es] for o in out)
        _check_output(out, model.output_type,
                      clip=len(range(*es.indices(L))))
    else:
        _check_output(out, model.output_type)


def test_poseformer_eval_slice():
    model = MOVEMENTS_MODELS["PoseFormer"](clip_length=L, receptive_frames=9)
    es = model.eval_slice
    assert es == slice(4, L - 9 + 4 + 1)
    x = jnp.zeros((B, L, J, 2))
    out, _ = _init_and_apply(model, x)
    # frames outside the coverage are exactly zero, covered frames are not
    assert np.all(np.asarray(out)[:, :4] == 0)


def test_seq2seq_teacher_forcing_runs(rng):
    from tests.ops.np_reference import random_rotation_matrices
    model = MOVEMENTS_MODELS["Seq2SeqEmbeddings"](
        teacher_mode="frames_force", teacher_force_ratio=0.5)
    assert model.needs_targets
    x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
    targets = {"pose_changes": jnp.asarray(
        random_rotation_matrices(rng, (B, L, J)).astype(np.float32))}
    out, _ = _init_and_apply(model, x, training=True, targets=targets)
    _check_output(out, MOT.pose_changes)


def test_seq2seq_bidirectional_wiring(rng):
    """Bidirectional encoder, torch nn.LSTM(bidirectional=True) dataflow
    (reference ``seq2seq.py:29-45``): both directions of every layer read the
    SAME layer input — so layer>=1 cells must have fan-in 2H (the previous
    layer's direction concat), not H — and the model runs/grads finitely."""
    model = MOVEMENTS_MODELS["Seq2Seq"](bidirectional=True, num_layers=2)
    x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
    out, params = _init_and_apply(model, x)
    _check_output(out, MOT.pose_changes)
    H = model.hidden_size
    p = params["params"]
    # layer 0: fwd (cell 0) and bwd (cell 1) both read the raw input
    assert p["OptimizedLSTMCell_0"]["ii"]["kernel"].shape[0] == \
        p["OptimizedLSTMCell_1"]["ii"]["kernel"].shape[0] == J * 2
    # layer 1: fwd (cell 2) and bwd (cell 3) both read the 2H concat
    assert p["OptimizedLSTMCell_2"]["ii"]["kernel"].shape[0] == 2 * H
    assert p["OptimizedLSTMCell_3"]["ii"]["kernel"].shape[0] == 2 * H


def test_seq2seq_residual_variants_differ(rng):
    x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
    outs = {}
    for name in ("Seq2SeqEmbeddings", "Seq2SeqResidualA", "Seq2SeqResidualB"):
        model = MOVEMENTS_MODELS[name]()
        out, _ = _init_and_apply(model, x)
        outs[name] = np.asarray(out)
    assert not np.allclose(outs["Seq2SeqEmbeddings"], outs["Seq2SeqResidualA"])
    assert not np.allclose(outs["Seq2SeqResidualA"], outs["Seq2SeqResidualB"])


def test_videopose3d_receptive_field_and_grad(rng):
    model = MOVEMENTS_MODELS["VideoPose3D"](filter_widths=(3, 3))
    assert model.receptive_field == 9
    x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           training=False)

    def loss(params):
        out = model.apply({**variables, "params": params}, x, training=False)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


def test_simple_transformer_grad(rng):
    model = MOVEMENTS_MODELS["SimpleTransformer"]()
    x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x)

    def loss(params):
        out = model.apply({"params": params}, x)
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree_util.tree_leaves(g))


@pytest.mark.parametrize("name,output_type", [
    ("LSTM", MOT.pose_changes),
    ("Seq2SeqEmbeddings", MOT.pose_changes),
    ("LinearAEResidual", MOT.absolute_loc_rot),  # BatchNorm mutables
    ("SimpleTransformer", MOT.pose_2d),
    ("PoseFormer", MOT.absolute_loc),
])
def test_bf16_training_step(name, output_type, rng):
    """Mixed precision: one jitted training step per representative model
    family — bf16 model compute must produce stable jit carries (scan
    carry dtypes, BatchNorm stats) and finite fp32 losses."""
    import jax

    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.autoencoder import AutoencoderFlow
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings

    flow_cls = AutoencoderFlow if output_type == MOT.pose_2d \
        else PoseLiftingFlow
    loss = LossModes.loc_2d if output_type == MOT.pose_2d \
        else LossModes.loc_2d_3d
    kwargs = {"movements_output_type": output_type}
    if name.startswith("PoseFormer"):
        kwargs = {"clip_length": 12}
    batch = generate_batch(
        jax.random.PRNGKey(0), Carla2D3DConfig(batch_size=2, clip_length=12))
    flow = flow_cls(movements_model=MOVEMENTS_MODELS[name](**kwargs),
                    loss_modes=[loss],
                    movements_optimizer=OptimizerSettings(lr=1e-3),
                    precision="bf16")
    state = flow.init_state(jax.random.PRNGKey(1), batch)
    step = jax.jit(flow.training_step, donate_argnums=(0,))
    state, logs = step(state, batch, jax.random.PRNGKey(2))
    state, logs = step(state, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(logs["train_loss/primary"]))
    assert all(l.dtype == jnp.float32
               for l in jax.tree_util.tree_leaves(state.params))


def test_seq2seq_rot_mul_grad_is_finite(rng):
    """Seq2SeqResidualC composes 6D rotations recurrently; a zero initial
    decoder input is a degenerate rotation whose normalize gradients overflow
    through the scan (NaN'd training on TPU). The identity-6D start must keep
    one full training-style gradient finite."""
    import jax

    model = MOVEMENTS_MODELS["Seq2SeqResidualC"](
        movements_output_type=MOT.pose_changes)
    x = jnp.asarray(rng.normal(size=(B, L, J, 2)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "dropout": jax.random.PRNGKey(1)},
                           x, training=False)

    def loss(params):
        out = model.apply({"params": params}, x, None, training=True,
                          rngs={"dropout": jax.random.PRNGKey(2)})
        return jnp.sum(out ** 2)

    g = jax.grad(loss)(variables["params"])
    assert all(bool(jnp.isfinite(l).all())
               for l in jax.tree_util.tree_leaves(g))
