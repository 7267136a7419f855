#!/usr/bin/env python
"""Training-stability sweep: 15 real-datamodule training steps per
(flow x model family) on the current backend, asserting every parameter
stays finite afterwards.

The masked losses can stay finite-looking while the params are NaN (the
normalizer zeroes non-finite predictions), so loss curves alone do not
catch divergence -- this sweep does. It found the zero-norm NaN-gradient
bug in the hips-neck extractor and the degenerate rot_mul decoder init
(see docs/PERFORMANCE.md "Training stability").

Run on TPU (default env) or CPU:
    python tools/stability_sweep.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np
from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import Carla2D3DDataModule
from pedestrians_video_2_carla_tpu.flows.pose_lifting import PoseLiftingFlow
from pedestrians_video_2_carla_tpu.flows.autoencoder import AutoencoderFlow
from pedestrians_video_2_carla_tpu.flows.classification import ClassificationFlow
from pedestrians_video_2_carla_tpu.flows.output_types import MovementsModelOutputType as MOT
from pedestrians_video_2_carla_tpu.losses import LossModes
from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS
from pedestrians_video_2_carla_tpu.models.classification import CLASSIFICATION_MODELS

def pfinite(t):
    return all(bool(np.isfinite(np.asarray(l)).all())
               for l in jax.tree_util.tree_leaves(t))

dm = Carla2D3DDataModule(batch_size=64, clip_length=16, transform='hips_neck',
                         val_set_size=64, test_set_size=64, seed=22742)
dm.prepare_data(); dm.setup('train')

CONFIGS = [
    ('LSTM', PoseLiftingFlow, ['loc_2d_3d'], {'movements_output_type': MOT.pose_changes}),
    ('Baseline3DPose', PoseLiftingFlow, ['loc_2d'], {}),
    ('Baseline3DPoseRot', PoseLiftingFlow, ['loc_2d_3d'], {}),
    ('LinearAEResidual', PoseLiftingFlow, ['loc_2d_loc_rot_3d'], {}),
    ('PoseFormer', PoseLiftingFlow, ['loc_2d_3d'], {'clip_length': 16}),
    ('Seq2SeqEmbeddings', PoseLiftingFlow, ['cum_pose_changes'], {'movements_output_type': MOT.pose_changes}),
    ('Seq2SeqResidualC', PoseLiftingFlow, ['loc_2d'], {'movements_output_type': MOT.pose_changes}),
    ('LinearAE2D', AutoencoderFlow, ['loc_2d'], {}),
    ('SimpleTransformer', AutoencoderFlow, ['loc_2d'], {}),
]
for name, flow_cls, losses, mk in CONFIGS:
    try:
        flow = flow_cls(movements_model=MOVEMENTS_MODELS[name](**mk),
                        loss_modes=[LossModes[l] for l in losses],
                        movements_optimizer=OptimizerSettings(lr=1e-3))
        it = iter(dm.train_batches(22742))
        state = flow.init_state(jax.random.PRNGKey(22742), next(it))
        step = jax.jit(flow.training_step, donate_argnums=(0,))
        rng = jax.random.PRNGKey(7)
        bad = None
        first_loss = last_loss = None
        for i, batch in enumerate(it):
            if i >= 15: break
            state, logs = step(state, batch, rng)
            v = float(logs['train_loss/primary'])
            if first_loss is None: first_loss = v
            last_loss = v
        ok = pfinite(state.params)
        print(f"{name:22s} {'/'.join(losses):22s} params_finite={ok} "
              f"loss {first_loss:.4f} -> {last_loss:.4f}", flush=True)
    except Exception as e:
        print(f"{name:22s} ERROR {repr(e)[:140]}", flush=True)

# classification flow (targets from synthetic crossing labels)
for name in ('LSTM', 'GCNBestPaper'):
    try:
        flow = ClassificationFlow(
            classification_model=CLASSIFICATION_MODELS[name](),
            movements_optimizer=None,
            classification_optimizer=OptimizerSettings(lr=1e-3))
        it = iter(dm.train_batches(22742))
        state = flow.init_state(jax.random.PRNGKey(22742), next(it))
        step = jax.jit(flow.training_step, donate_argnums=(0,))
        rng = jax.random.PRNGKey(7)
        for i, batch in enumerate(it):
            if i >= 10: break
            state, logs = step(state, batch, rng)
        print(f"cls:{name:18s} params_finite={pfinite(state.params)} "
              f"loss {float(logs['train_loss/primary']):.4f}", flush=True)
    except Exception as e:
        print(f"cls:{name:18s} ERROR {repr(e)[:140]}", flush=True)
