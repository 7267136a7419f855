"""Martinez'17 "simple yet effective baseline" 2D->3D lifter, per frame
(reference wrapper ``modules/movements/baseline_3d_pose/``; architecture from
the public 3d_pose_baseline: Linear(2J->1024) + BN + ReLU + Dropout, N residual
stages of two such blocks, Linear(1024->3J)). ``Baseline3DPoseRot`` is the
reference's 6D-rotations variant (``baseline_3d_pose_rot.py``)."""
import flax.linen as nn

from ...flows.output_types import MovementsModelOutputType
from ...ops.rotations import rotation_6d_to_matrix
from .common import MovementsModel


class _LinearBlock(nn.Module):
    linear_size: int
    p_dropout: float

    @nn.compact
    def __call__(self, x, training: bool = False):
        y = nn.Dense(self.linear_size,
                     kernel_init=nn.initializers.kaiming_normal())(x)
        y = nn.BatchNorm(use_running_average=not training)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.p_dropout, deterministic=not training)(y)
        y = nn.Dense(self.linear_size,
                     kernel_init=nn.initializers.kaiming_normal())(y)
        y = nn.BatchNorm(use_running_average=not training)(y)
        y = nn.relu(y)
        y = nn.Dropout(self.p_dropout, deterministic=not training)(y)
        return x + y


class Baseline3DPose(MovementsModel):
    linear_size: int = 1024
    num_stage: int = 2
    p_dropout: float = 0.5
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.absolute_loc

    @property
    def _out_features(self):
        return 3

    @nn.compact
    def __call__(self, x, targets=None, training: bool = False):
        B, L = x.shape[:2]
        out_joints = len(self.output_nodes)
        h = x[..., :2].reshape(B * L, -1)
        h = nn.Dense(self.linear_size,
                     kernel_init=nn.initializers.kaiming_normal())(h)
        h = nn.BatchNorm(use_running_average=not training)(h)
        h = nn.relu(h)
        h = nn.Dropout(self.p_dropout, deterministic=not training)(h)
        for _ in range(self.num_stage):
            h = _LinearBlock(self.linear_size, self.p_dropout)(h, training)
        out = nn.Dense(out_joints * self._out_features,
                       kernel_init=nn.initializers.kaiming_normal())(h)
        out = out.reshape(B, L, out_joints, self._out_features)
        return self._finalize(out)

    def _finalize(self, out):
        return out

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.absolute_loc]


class Baseline3DPoseRot(Baseline3DPose):
    """6D-rotation output variant -> relative_rot matrices."""
    movements_output_type: MovementsModelOutputType = \
        MovementsModelOutputType.relative_rot

    @property
    def _out_features(self):
        return 6

    def _finalize(self, out):
        return rotation_6d_to_matrix(out)

    @staticmethod
    def supported_output_types():
        return [MovementsModelOutputType.relative_rot]
