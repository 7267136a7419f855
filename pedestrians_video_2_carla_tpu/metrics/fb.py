"""FB_* metric family: JAX re-implementations of the VideoPose3D loss
functions (mpjpe / weighted / Procrustes-aligned / scale-normalized / velocity)
wrapped as additive-state metrics (reference ``metrics/fb/*.py`` delegating to
``third_party/video_pose_3d/loss.py``). All values in mm.

Unlike the reference (which drops to numpy for the Procrustes SVD), PA-MPJPE
here is pure JAX (`jnp.linalg.svd` batches fine on TPU).
"""
from typing import Dict

import jax.numpy as jnp

from .base import Metric, safe_div


def fb_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Mean euclidean distance per joint: (N, J, 3) -> scalar."""
    return jnp.mean(jnp.linalg.norm(pred - gt, axis=-1))


def fb_weighted_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray,
                      w: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(w * jnp.linalg.norm(pred - gt, axis=-1))


def fb_n_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """MPJPE after optimal per-sample scaling of predictions."""
    norm_pred = jnp.mean(jnp.sum(pred ** 2, axis=-1, keepdims=True),
                         axis=-2, keepdims=True)
    norm_gt = jnp.mean(jnp.sum(gt * pred, axis=-1, keepdims=True),
                       axis=-2, keepdims=True)
    scale = norm_gt / jnp.maximum(norm_pred, 1e-12)
    return fb_mpjpe(scale * pred, gt)


def fb_p_mpjpe(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """Procrustes-aligned MPJPE: optimal rigid (rotation+scale+translation)
    alignment of each (J, 3) sample before the error."""
    mu_x = jnp.mean(gt, axis=1, keepdims=True)
    mu_y = jnp.mean(pred, axis=1, keepdims=True)
    x0 = gt - mu_x
    y0 = pred - mu_y
    norm_x = jnp.sqrt(jnp.sum(x0 ** 2, axis=(1, 2), keepdims=True))
    norm_y = jnp.sqrt(jnp.sum(y0 ** 2, axis=(1, 2), keepdims=True))
    x0 = x0 / jnp.maximum(norm_x, 1e-12)
    y0 = y0 / jnp.maximum(norm_y, 1e-12)

    h = jnp.matmul(jnp.swapaxes(x0, -1, -2), y0)
    u, s, vt = jnp.linalg.svd(h)
    v = jnp.swapaxes(vt, -1, -2)
    r = jnp.matmul(v, jnp.swapaxes(u, -1, -2))
    # fix improper rotations (reflections)
    sign_det_r = jnp.sign(jnp.expand_dims(jnp.linalg.det(r), axis=-1))
    v = v.at[:, :, -1].multiply(sign_det_r)
    s = s.at[:, -1].multiply(sign_det_r[..., 0])
    r = jnp.matmul(v, jnp.swapaxes(u, -1, -2))

    tr = jnp.expand_dims(jnp.sum(s, axis=1, keepdims=True), axis=-1)
    a = tr * norm_x / jnp.maximum(norm_y, 1e-12)
    t = mu_x - a * jnp.matmul(mu_y, r)
    pred_aligned = a * jnp.matmul(pred, r) + t
    return fb_mpjpe(pred_aligned, gt)


def fb_mean_velocity_error(pred: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    """MPJVE: mean per-joint velocity error along the frame axis.
    Expects (B, L, J, 3)."""
    v_pred = jnp.diff(pred, axis=1)
    v_gt = jnp.diff(gt, axis=1)
    return jnp.mean(jnp.linalg.norm(v_pred - v_gt, axis=-1))


class _FBBase(Metric):
    needs_clip_shape = False

    def init_state(self):
        return {"errors": jnp.zeros(()), "total": jnp.zeros((), jnp.int32)}

    def _metric(self, pred, gt):
        raise NotImplementedError

    def update(self, state, preds: Dict, targets: Dict):
        pred = preds.get("absolute_pose_loc")
        gt = targets.get("absolute_pose_loc")
        if pred is None or gt is None or pred.shape != gt.shape:
            return state
        if not self.needs_clip_shape:
            pred = pred.reshape((-1,) + pred.shape[-2:])
            gt = gt.reshape((-1,) + gt.shape[-2:])
        frames = pred.shape[0] if not self.needs_clip_shape \
            else pred.shape[0] * pred.shape[1]
        value = self._metric(pred, gt)
        return {"errors": state["errors"] + frames * value,
                "total": state["total"] + frames}

    def compute(self, state):
        return 1000.0 * safe_div(state["errors"], state["total"])


class FB_MPJPE(_FBBase):
    def _metric(self, pred, gt):
        return fb_mpjpe(pred, gt)


class FB_WeightedMPJPE(_FBBase):
    def __init__(self, weights=None):
        self.weights = weights

    def _metric(self, pred, gt):
        w = self.weights if self.weights is not None \
            else jnp.ones(pred.shape[:-1], pred.dtype)
        return fb_weighted_mpjpe(pred, gt, w)


class FB_N_MPJPE(_FBBase):
    def _metric(self, pred, gt):
        return fb_n_mpjpe(pred, gt)


class FB_PA_MPJPE(_FBBase):
    def _metric(self, pred, gt):
        return fb_p_mpjpe(pred, gt)


class FB_MPJVE(_FBBase):
    needs_clip_shape = True

    def _metric(self, pred, gt):
        return fb_mean_velocity_error(pred, gt)
