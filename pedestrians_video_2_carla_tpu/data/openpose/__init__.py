"""OpenPose-keypoints datamodules (JAAD / PIE) — reference ``data/openpose/``."""
