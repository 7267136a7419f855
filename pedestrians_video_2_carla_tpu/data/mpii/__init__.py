"""MPII Human Pose data (reference ``data/mpii/``)."""
