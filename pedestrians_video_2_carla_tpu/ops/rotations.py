"""Rotation representation conversions (euler / matrix / 6D / CARLA convention).

Re-implements, in pure JAX, the subset of ``pytorch3d.transforms`` the reference
relies on (``euler_angles_to_matrix``, ``matrix_to_euler_angles``,
``rotation_6d_to_matrix``, ``matrix_to_rotation_6d``; used at reference
``walker_control/p3d_pose.py:17-18``, ``modules/movements/movements.py:5``) plus the
CARLA<->P3D convention bridge (negated z / negated euler angles, reference
``walker_control/p3d_pose.py:34-54``).

All matrices act on **row vectors** (``v' = v @ R``), matching the reference's
composition order throughout.
"""
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

#: All rotation/FK/camera math uses 3x3 matrices where bf16 MXU rounding (the
#: TPU matmul default) would cost ~3 decimal digits; force fp32 accumulation.
#: These ops are tiny VPU-bound work, so HIGHEST costs nothing measurable.
_mm_flat = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)


def mm(a, b):
    """Batched matmul with fp32 accumulation, with ALL leading batch dims
    flattened to one before the dot. Two reasons: (a) XLA CPU's algebraic
    simplifier miscompiles gradients of dots with 3+ batch dims (RET_CHECK
    transpose/dot shape failure), and (b) a single flat batch dim gives the
    TPU compiler the simplest layout to tile."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if a.ndim <= 3 and b.ndim <= 3:
        return _mm_flat(a, b)
    import numpy as _np
    batch = _np.broadcast_shapes(a.shape[:-2], b.shape[:-2])
    a2 = jnp.broadcast_to(a, batch + a.shape[-2:])
    b2 = jnp.broadcast_to(b, batch + b.shape[-2:])
    n = int(_np.prod(batch)) if batch else 1
    out = _mm_flat(a2.reshape((n,) + a.shape[-2:]),
                   b2.reshape((n,) + b.shape[-2:]))
    return out.reshape(batch + (a.shape[-2], b.shape[-1]))


def _axis_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix about a named axis; pytorch3d ``_axis_angle_rotation``
    element order."""
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix_np(euler_angles, convention: str = "XYZ"):
    """Pure-numpy variant for host-side constant loading (safe to call while
    a jit trace is active — jnp ops would be staged by omnistaging)."""
    import numpy as np
    euler_angles = np.asarray(euler_angles)

    def axis_rot(axis, a):
        c, s = np.cos(a), np.sin(a)
        one, zero = np.ones_like(a), np.zeros_like(a)
        flat = {
            "X": (one, zero, zero, zero, c, -s, zero, s, c),
            "Y": (c, zero, s, zero, one, zero, -s, zero, c),
            "Z": (c, -s, zero, s, c, zero, zero, zero, one),
        }[axis]
        return np.stack(flat, axis=-1).reshape(a.shape + (3, 3))

    mats = [axis_rot(c, euler_angles[..., i]) for i, c in enumerate(convention)]
    return mats[0] @ mats[1] @ mats[2]


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """(..., 3) angles in radians -> (..., 3, 3); R = R_c0(a0) @ R_c1(a1) @ R_c2(a2)."""
    euler_angles = jnp.asarray(euler_angles)
    matrices = [_axis_rotation(c, euler_angles[..., i])
                for i, c in enumerate(convention)]
    return mm(mm(matrices[0], matrices[1]), matrices[2])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str = "XYZ") -> jnp.ndarray:
    """Inverse of :func:`euler_angles_to_matrix` for the "XYZ" convention.

    angles = (atan2(-M[1,2], M[2,2]), asin(M[0,2]), atan2(-M[0,1], M[0,0]))
    """
    if convention != "XYZ":
        raise NotImplementedError("only the XYZ convention is used in this codebase")
    matrix = jnp.asarray(matrix)
    central = jnp.arcsin(jnp.clip(matrix[..., 0, 2], -1.0, 1.0))
    first = jnp.arctan2(-matrix[..., 1, 2], matrix[..., 2, 2])
    third = jnp.arctan2(-matrix[..., 0, 1], matrix[..., 0, 0])
    return jnp.stack([first, central, third], axis=-1)


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) column-vector-convention
    rotation matrices (the convention SMPL body models use)."""
    # sqrt of clamped sum-of-squares: jnp.linalg.norm has a NaN gradient at
    # exactly-zero vectors (0 * (0/0)); the clamped form returns the identity
    # matrix there with a finite (zero) gradient
    angle = jnp.sqrt(jnp.maximum(
        jnp.sum(axis_angle * axis_angle, axis=-1, keepdims=True), 1e-24))
    axis = axis_angle / jnp.maximum(angle, 1e-12)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zero = jnp.zeros_like(x)
    K = jnp.stack([
        jnp.stack([zero, -z, y], -1),
        jnp.stack([z, zero, -x], -1),
        jnp.stack([-y, x, zero], -1),
    ], -2)
    a = angle[..., None]
    eye = jnp.broadcast_to(jnp.eye(3, dtype=axis_angle.dtype), K.shape)
    return eye + jnp.sin(a) * K + (1.0 - jnp.cos(a)) * mm(K, K)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Zhou et al. '19 continuous 6D representation -> rotation matrix,
    Gram-Schmidt on the two stored rows (pytorch3d-compatible layout: the 6D
    vector is rows 0 and 1 of the matrix)."""
    a1, a2 = d6[..., :3], d6[..., 3:]

    def safe_normalize(v):
        # sqrt(sum+eps) keeps the gradient finite at v == 0 (a plain norm has
        # a NaN gradient there, which poisons training on degenerate inputs)
        return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True)
                                 + 1e-12)

    b1 = safe_normalize(a1)
    a2_proj = jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = safe_normalize(a2 - a2_proj)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """First two rows of the rotation matrix, flattened to (..., 6)."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))


# ---------------------------------------------------------------------------
# CARLA convention bridge
# ---------------------------------------------------------------------------
# CARLA/UE4 rotations are degrees (pitch, yaw, roll) in a left-handed system; the
# tensor core works in the right-handed P3D convention where z and all angles are
# negated: matrix = euler_to_matrix(deg2rad(-roll, -pitch, -yaw), "XYZ").

def carla_rotation_to_matrix(pitch_yaw_roll_deg: jnp.ndarray) -> jnp.ndarray:
    pyr = jnp.deg2rad(jnp.asarray(pitch_yaw_roll_deg))
    angles = jnp.stack([-pyr[..., 2], -pyr[..., 0], -pyr[..., 1]], axis=-1)
    return euler_angles_to_matrix(angles, "XYZ")


def matrix_to_carla_rotation(matrix: jnp.ndarray) -> jnp.ndarray:
    """-> degrees (pitch, yaw, roll)."""
    angles = -jnp.rad2deg(matrix_to_euler_angles(matrix, "XYZ"))
    return jnp.stack([angles[..., 1], angles[..., 2], angles[..., 0]], axis=-1)


def carla_location_to_p3d(xyz: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([xyz[..., 0], xyz[..., 1], -xyz[..., 2]], axis=-1)


p3d_location_to_carla = carla_location_to_p3d  # involution


def eye_batch(shape: Tuple[int, ...], n: int = 3, dtype=jnp.float32) -> jnp.ndarray:
    """Batched identity matrices (reference ``utils/tensors.py:4``)."""
    return jnp.broadcast_to(jnp.eye(n, dtype=dtype), tuple(shape) + (n, n))
