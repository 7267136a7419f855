"""TPU-native framework for pedestrian video-to-CARLA pose research.

A ground-up JAX/XLA/Pallas/pjit re-design of the capabilities of
``wielgosz-info/pedestrians-video-2-carla``: 2D pedestrian skeletons (OpenPose on
JAAD/PIE, CARLA-recorded synthetic data, AMASS/SMPL mocap) are used to train
movements models (pose lifters / autoencoders / classifiers / pose estimators)
whose outputs pass through a differentiable CARLA-skeleton forward-kinematics layer
and pinhole camera projection so losses can live in 2D-projection and/or 3D space;
predicted bone rotations can then drive CARLA simulator walkers.

Compute-path design is TPU-first: batched XLA ops over static shapes, ``lax``
scans for temporal recurrences, Pallas kernels for the fused FK+projection hot
path, and ``jax.sharding`` meshes for multi-chip scaling.
"""

__version__ = "0.1.0"
