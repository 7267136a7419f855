"""Pure-JAX numerical core: rotation algebra, CARLA-skeleton forward kinematics,
pinhole camera projection, world-track accumulation, pose normalization and
augmentation. Everything here is functional, shape-static and jit/vmap/pjit
friendly; the fused hot path also has a Pallas TPU kernel (``ops.pallas``)."""
