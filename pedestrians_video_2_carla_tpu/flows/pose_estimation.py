"""Pose-estimation flow (reference ``modules/flow/pose_estimation.py:17-134``):
model predicts 2D keypoints (directly or via heatmaps -> argmax); metrics are
the autoencoder-flow 2D set."""


from ..models.pose_estimation import POSE_ESTIMATION_MODELS
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
            sliced[self.outputs_key] = keypoints_from_heatmaps(out)[es]
        else:
            sliced[self.outputs_key] = out[es]
        return sliced, {"movements": mov_mutables,
                        "trajectory": mutables["trajectory"]}
