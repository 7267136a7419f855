"""Independent numpy implementations used as the second voice in
dual-implementation equivalence tests (the reference repo used its own
torch-vs-CARLA pairs the same way; SURVEY.md §4).

These mirror the *recursive* reference algorithms literally — one bone at a
time — so they share no code shape with the batched level-parallel JAX ops.
"""
import numpy as np

from pedestrians_video_2_carla_tpu.skeletons.carla import NUM_BONES, PARENTS


def euler_to_matrix_xyz(angles):
    """R = Rx(a0) @ Ry(a1) @ Rz(a2), row-vector convention matrices."""
    a, b, c = angles
    ca, sa = np.cos(a), np.sin(a)
    cb, sb = np.cos(b), np.sin(b)
    cc, sc = np.cos(c), np.sin(c)
    rx = np.array([[1, 0, 0], [0, ca, -sa], [0, sa, ca]])
    ry = np.array([[cb, 0, sb], [0, 1, 0], [-sb, 0, cb]])
    rz = np.array([[cc, -sc, 0], [sc, cc, 0], [0, 0, 1]])
    return rx @ ry @ rz


def fk_recursive(rel_loc, rel_rot):
    """Sequential bone-by-bone FK: 4x4 row-vector affine composition, exactly the
    reference recursion (p3d_pose.py:116-149) but in numpy."""
    abs_loc = np.zeros_like(rel_loc)
    abs_rot = np.zeros_like(rel_rot)
    transforms = [None] * NUM_BONES
    for i in range(NUM_BONES):
        p = PARENTS[i]
        prev = np.eye(4) if p < 0 else transforms[p]
        pad_loc = np.concatenate([rel_loc[i], [1.0]])
        abs_loc[i] = (pad_loc @ prev)[:3]
        abs_rot[i] = rel_rot[i] @ prev[:3, :3]
        t = np.eye(4)
        t[:3, :3] = abs_rot[i]
        t[3, :3] = abs_loc[i]
        transforms[i] = t
    return abs_loc, abs_rot


def random_rotation_matrices(rng, shape):
    """Uniform-ish random rotations from random euler angles."""
    angles = rng.uniform(-np.pi, np.pi, size=shape + (3,))
    flat = angles.reshape(-1, 3)
    mats = np.stack([euler_to_matrix_xyz(a) for a in flat])
    return mats.reshape(shape + (3, 3))
