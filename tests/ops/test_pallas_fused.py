"""Pallas fused-projection kernel: equivalence vs the XLA component path
(interpret mode on CPU) and custom-VJP gradients."""
import jax
import jax.numpy as jnp
import numpy as np

from pedestrians_video_2_carla_tpu.ops import camera as C
from pedestrians_video_2_carla_tpu.ops.pallas.fused_projection import (
    fused_projection, fused_projection_pallas, fused_projection_reference,
    fused_projection_train)
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


def _reference_proj_abs(changes, rl, rr, cam):
    from pedestrians_video_2_carla_tpu.ops import kinematics as K
    _, abs_loc, _ = K.relative_pose_over_clip(changes, rl, rr)
    return C.project_pose(cam, abs_loc), abs_loc


def test_train_kernel_forward_matches_xla(rng):
    changes, rl, rr, cam = _inputs(rng)
    proj_ref, abs_ref = _reference_proj_abs(changes, rl, rr, cam)
    proj, abs_loc = fused_projection_train(changes, rl, rr, cam)
    np.testing.assert_allclose(np.asarray(proj), np.asarray(proj_ref),
                               atol=1e-3)
    np.testing.assert_allclose(np.asarray(abs_loc), np.asarray(abs_ref),
                               atol=1e-5)


def test_train_kernel_pallas_backward_matches_xla(rng):
    # the hand-written reverse-mode kernel: cotangents for ALL THREE inputs
    # (pose changes, reference locations, initial rotations) through a loss
    # consuming both the 2D projections and the 3D absolute pose
    changes, rl, rr, cam = _inputs(rng)

    def loss(fn):
        def f(c, l, r):
            proj, abs_loc = fn(c, l, r, cam)
            return (jnp.sum(jnp.sin(proj[..., :2] * 0.01))
                    + jnp.sum(abs_loc ** 2))
        return f

    g_pal = jax.grad(loss(fused_projection_train), argnums=(0, 1, 2))(
        changes, rl, rr)
    g_xla = jax.grad(loss(_reference_proj_abs), argnums=(0, 1, 2))(
        changes, rl, rr)
    for pal, ref in zip(g_pal, g_xla):
        scale = max(float(np.abs(np.asarray(ref)).max()), 1e-8)
        np.testing.assert_allclose(np.asarray(pal) / scale,
                                   np.asarray(ref) / scale,
                                   rtol=1e-4, atol=1e-5)


def test_train_block_b_choice(monkeypatch):
    # the default block must divide the padded batch and never pick the
    # 1024-lane width that overflows the backward's scoped VMEM
    import importlib
    # the package re-exports the kernel function under the module's name,
    # shadowing attribute-style module access — resolve via importlib
    fp = importlib.import_module(
        "pedestrians_video_2_carla_tpu.ops.pallas.fused_projection")

    monkeypatch.setenv("PVC_PALLAS_BLOCK_B", "512")
    assert fp._train_block_b(1024) == 512
    monkeypatch.delenv("PVC_PALLAS_BLOCK_B")

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    for b in (1024, 4096, 256, 2048):
        blk = fp._train_block_b(b)
        padded = max(blk, -(-b // blk) * blk)
        assert blk <= 512 and padded % blk == 0
    # non-multiple-of-256 padded batches fall back to the base block
    assert fp._train_block_b(100) == fp.BLOCK_B
