"""Trajectory models (world-track prediction). The reference only ships the
Zero model (``modules/trajectory/``); same here, behind the same interface so
real trajectory models can slot in."""
from .zero import TrajectoryModel, ZeroTrajectory

TRAJECTORY_MODELS = {m.__name__: m for m in [ZeroTrajectory]}
