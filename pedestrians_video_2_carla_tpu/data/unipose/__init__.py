"""UniPose-extracted keypoints (reference ``data/unipose/``; experimental)."""
