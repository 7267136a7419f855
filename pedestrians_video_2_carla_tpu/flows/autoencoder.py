"""2D-pose autoencoder flow: the model output *is* the (transformed) 2D pose
(reference ``modules/flow/autoencoder.py:19-133``)."""

from ..metrics.pose import PCK, MissingJointsRatio, MultiinputMSE
from ..models.movements import MOVEMENTS_MODELS
from .base import BaseFlow


class AutoencoderFlow(BaseFlow):
    @classmethod
    def get_available_models(cls):
        return {"movements": dict(MOVEMENTS_MODELS)}

    @classmethod
    def get_default_models(cls):
        return {"movements": MOVEMENTS_MODELS["LSTM"]}

    def get_initial_metrics(self):
        return {
            "MJR": MissingJointsRatio(
                input_nodes=self.movements_model.input_nodes,
                output_nodes=self.movements_model.output_nodes),
        }

    def get_metrics(self):
        common = dict(input_nodes=self.movements_model.input_nodes,
                      output_nodes=self.movements_model.output_nodes,
                      mask_missing_joints=self.mask_missing_joints)
        return {
            "MSE": MultiinputMSE(key=self.outputs_key, **common),
            "PCKhn@01": PCK(key=self.outputs_key, threshold=0.1,
                            normalization="hn", **common),
            "PCK@005": PCK(key=self.outputs_key, threshold=0.05,
                           normalization="bbox", **common),
        }

    def _inner_step(self, params, mutables, batch, training, rngs):
        inputs, targets, meta = batch
        pose_inputs, mov_mutables = self._apply_model(
            self.movements_model, params["movements"], mutables["movements"],
            inputs, targets if training and self.movements_model.needs_targets
            else None, training, rngs)

        es = (slice(None), self.movements_model.eval_slice)
        sliced = {
            # model output lives in the normalized space when a transform is on
            self.outputs_key: pose_inputs[es],
            "inputs": inputs[es],
            "targets": {k: v[es] if hasattr(v, "ndim") and v.ndim > 1 else v
                        for k, v in targets.items()},
        }
        return sliced, {"movements": mov_mutables,
                        "trajectory": mutables["trajectory"]}
