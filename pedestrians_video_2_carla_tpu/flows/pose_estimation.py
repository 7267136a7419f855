"""Pose-estimation flow (reference ``modules/flow/pose_estimation.py:17-134``):
model predicts 2D keypoints (directly or via heatmaps -> argmax); metrics are
the autoencoder-flow 2D set."""

import jax.numpy as jnp

from ..models.pose_estimation import POSE_ESTIMATION_MODELS
from ..ops import normalization as N
from ..ops.heatmaps import keypoints_from_heatmaps
from .autoencoder import AutoencoderFlow
from .output_types import PoseEstimationModelOutputType


class PoseEstimationFlow(AutoencoderFlow):
    @classmethod
    def get_available_models(cls):
        return {"movements": dict(POSE_ESTIMATION_MODELS)}

    @classmethod
    def get_default_models(cls):
        return {"movements": POSE_ESTIMATION_MODELS["UniPoseLSTM"]}

    def initial_preds(self, inputs, targets):
        """No inputs-as-prediction baseline: pose-estimation inputs are video
        frames (B, L, H, W, 3), not keypoints (reference's initial metrics
        only exist on the keypoint flows, ``flow/base.py:258-298``)."""
        if inputs.ndim == 5:
            return {}
        return super().initial_preds(inputs, targets)

    def _inner_step(self, params, mutables, batch, training, rngs):
        inputs, targets, meta = batch
        out, mov_mutables = self._apply_model(
            self.movements_model, params["movements"], mutables["movements"],
            inputs, targets if training and self.movements_model.needs_targets
            else None, training, rngs)

        es = (slice(None), self.movements_model.eval_slice)
        sliced = {"inputs": inputs[es],
                  "targets": {k: v[es] if hasattr(v, "ndim") and v.ndim > 1
                              else v for k, v in targets.items()}}
        if self.movements_model.output_type \
                == PoseEstimationModelOutputType.heatmaps:
            sliced["heatmaps"] = out[es]
            # argmax coords live in the heatmap canvas; scale them back to
            # the model-INPUT pixel space (reference ``pose_estimation.py:
            # 113-134`` multiplies by bbox_size/heatmap_size), then apply the
            # flow's normalizer so projection_2d_transformed is in the same
            # space as the normalized targets (reference applies
            # ``dm.transform_callable``). Hips-neck extraction is computed
            # from the keypoints themselves, so it is invariant to the crop's
            # residual offset/scale vs original frame pixels.
            kp = keypoints_from_heatmaps(out)
            H, W = inputs.shape[2:4]
            hm_h, hm_w = out.shape[-2:]
            kp_px = kp * jnp.asarray([W / hm_w, H / hm_h], kp.dtype)
            sliced["projection_2d"] = kp_px[es]
            if self.transform not in (None, "none"):
                kp_t, _ = N.normalize_with(
                    kp_px, self.movements_model.output_nodes,
                    extractor=self.transform)
                sliced["projection_2d_transformed"] = kp_t[es]
        else:
            sliced[self.outputs_key] = out[es]
        return sliced, {"movements": mov_mutables,
                        "trajectory": mutables["trajectory"]}
