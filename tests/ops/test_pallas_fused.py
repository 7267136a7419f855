"""Pallas fused-projection kernel: equivalence vs the XLA component path
(interpret mode on CPU) and custom-VJP gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.ops import camera as C
from pedestrians_video_2_carla_tpu.ops.pallas.fused_projection import (
    fused_projection, fused_projection_pallas, fused_projection_reference)
from pedestrians_video_2_carla_tpu.skeletons.carla import load_reference_pose

from .np_reference import random_rotation_matrices

B, L = 5, 4


def _inputs(rng):
    rel_loc, rel_rot = load_reference_pose("adult_female")
    rl = jnp.broadcast_to(rel_loc, (B, 26, 3))
    rr = jnp.broadcast_to(rel_rot, (B, 26, 3, 3))
    changes = jnp.asarray(
        random_rotation_matrices(rng, (B, L, 26)).astype(np.float32))
    return changes, rl, rr, C.make_camera()


def test_pallas_matches_xla(rng):
    changes, rl, rr, cam = _inputs(rng)
    ref = np.asarray(fused_projection_reference(changes, rl, rr, cam))
    pal = np.asarray(fused_projection_pallas(changes, rl, rr, cam))
    np.testing.assert_allclose(pal, ref, atol=1e-3)


def test_pallas_handles_unaligned_batch(rng):
    # B=5 is far from the 128-lane block; padding must be transparent
    changes, rl, rr, cam = _inputs(rng)
    out = fused_projection_pallas(changes, rl, rr, cam)
    assert out.shape == (B, L, 26, 3)


def test_custom_vjp_gradients_match_xla(rng):
    changes, rl, rr, cam = _inputs(rng)

    def loss_pallas(c):
        return jnp.sum(fused_projection(c, rl, rr, cam)[..., :2] ** 2)

    def loss_xla(c):
        return jnp.sum(
            fused_projection_reference(c, rl, rr, cam)[..., :2] ** 2)

    g_pal = jax.grad(loss_pallas)(changes)
    g_xla = jax.grad(loss_xla)(changes)
    np.testing.assert_allclose(np.asarray(g_pal), np.asarray(g_xla),
                               rtol=1e-3, atol=1e-2)
