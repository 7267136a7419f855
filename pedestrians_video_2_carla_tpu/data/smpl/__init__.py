"""SMPL / AMASS mocap data (reference ``data/smpl/``)."""
