"""Pinhole camera: look-at view transform + screen-space projection.

Replaces the reference's ``pytorch3d.renderer.PerspectiveCameras`` /
``look_at_view_transform`` usage (``walker_control/p3d_pose_projection.py:37-69,
115-152``) and the numpy ``cameratransform`` camera
(``walker_control/pose_projection.py:77-98``) with one explicit, differentiable
formulation.

Derivation of the screen formula (pytorch3d v0.6.0 semantics): the chain
``screen-space K -> screen_to_ndc(no flip) -> ndc_to_screen(xy flip)`` collapses to

    x_screen = W - (fx * x_view / z_view + px)
    y_screen = H - (fy * y_view / z_view + py)

with pytorch3d view axes (+X left, +Y up, +Z into the screen), which with the
centered principal point used throughout (px=W/2) is the standard CV pinhole with
x growing right and y growing down.  The third output channel is the view-space
depth ``z_view`` (the reference never consumes it: every downstream use slices
``[..., :2]``).

Default camera = the reference's ``RGBCameraMock`` (800x600, fov 90deg, 0.08 m
lens => fx = fy = 400 px) placed ``distance=3.1 m`` in front of and
``elevation=1.2 m`` above the pedestrian origin (``carla_utils/setup.py:38-63``),
looking at the pedestrian, up = (0, 0, -1) in P3D world coordinates.
"""
from typing import NamedTuple, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .rotations import mm

#: P3D pose space -> P3D world space axis swap (reference
#: ``p3d_pose_projection.py:137-142``): (x, y, z) -> (y, -x, z), row-vector matrix.
P3D_2_WORLD = np.asarray([
    (0.0, -1.0, 0.0),
    (1.0, 0.0, 0.0),
    (0.0, 0.0, 1.0),
], dtype=np.float32)

DEFAULT_IMAGE_SIZE = (800, 600)   # (width, height)
DEFAULT_FOV_DEG = 90.0
DEFAULT_LENS_SIZE_M = 0.08        # CARLA RGB camera lens_x_size
DEFAULT_CAMERA_DISTANCE = 3.1     # m in front of pedestrian
DEFAULT_CAMERA_ELEVATION = 1.2    # m above ground


def look_at_view_transform(eye, at, up) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Row-vector world->view transform: ``X_view = X_world @ R + T``.

    pytorch3d-compatible: ``z = normalize(at - eye)``, ``x = normalize(up x z)``,
    ``y = normalize(z x x)``, ``R = [x; y; z]^T``, ``T = -eye @ R``.
    """
    eye = jnp.asarray(eye, dtype=jnp.float32)
    at = jnp.asarray(at, dtype=jnp.float32)
    up = jnp.asarray(up, dtype=jnp.float32)

    def _norm(v):
        # clamp the summed squares *before* the sqrt so the VJP stays finite
        # at exactly-zero vectors (ops/normalization.py::_safe_norm pattern)
        sq = jnp.sum(v * v, axis=-1, keepdims=True)
        return v / jnp.sqrt(jnp.maximum(sq, 1e-10))

    z_axis = _norm(at - eye)
    x_axis = _norm(jnp.cross(up, z_axis))
    y_axis = _norm(jnp.cross(z_axis, x_axis))
    R = jnp.stack([x_axis, y_axis, z_axis], axis=-2)
    R = jnp.swapaxes(R, -1, -2)
    T = -mm(eye, R)
    return R, T


class PinholeCamera(NamedTuple):
    """Static camera parameters; a plain pytree so it can be closed over or
    passed through jit without re-tracing."""
    R: jnp.ndarray           # (3, 3) world->view rotation (row-vector)
    T: jnp.ndarray           # (3,) world->view translation
    focal: Tuple[float, float]        # (fx, fy) pixels
    principal: Tuple[float, float]    # (px, py) pixels
    image_size: Tuple[int, int]       # (width, height)

    def project_planes(self, x, y, z0):
        """Plane form of :meth:`project`: 3 (...,) world component planes ->
        (x_screen, y_screen, depth) planes.

        Written in unstacked component form: batched (.., 3) x (3, 3) matmuls
        force the TPU to pad the 3-wide dims to full (8, 128) tiles (~40x
        memory bloat); as elementwise FMAs over the big batch dims the whole
        projection runs on the VPU at bandwidth speed."""
        R, T = self.R, self.T
        vx = x * R[0, 0] + y * R[1, 0] + z0 * R[2, 0] + T[0]
        vy = x * R[0, 1] + y * R[1, 1] + z0 * R[2, 1] + T[1]
        vz = x * R[0, 2] + y * R[1, 2] + z0 * R[2, 2] + T[2]
        w, h = self.image_size
        fx, fy = self.focal
        px, py = self.principal
        inv_z = 1.0 / vz
        x_screen = w - (fx * vx * inv_z + px)
        y_screen = h - (fy * vy * inv_z + py)
        return x_screen, y_screen, vz

    def project(self, points_world: jnp.ndarray) -> jnp.ndarray:
        """(..., 3) world points -> (..., 3) = (x_screen, y_screen, depth)."""
        x_screen, y_screen, vz = self.project_planes(
            points_world[..., 0], points_world[..., 1], points_world[..., 2])
        return jnp.stack([x_screen, y_screen, vz], axis=-1)


def focal_px_from_fov(fov_deg: float, lens_size_m: float = DEFAULT_LENS_SIZE_M) -> float:
    """Reference focal math (``p3d_pose_projection.py:49-63``):
    focal_mm = sensor_width_mm / (2 tan(fov/2)); passed as focal_mm * 10 which,
    with the 80 mm sensor and 800 px width, equals W / (2 tan(fov/2)) px."""
    sensor_width_mm = lens_size_m * 1000.0
    return float(sensor_width_mm / (2.0 * np.tan(np.deg2rad(fov_deg) / 2.0)) * 10.0)


def make_camera(distance: float = DEFAULT_CAMERA_DISTANCE,
                shift: float = 0.0,
                elevation: float = DEFAULT_CAMERA_ELEVATION,
                look_at: Optional[Tuple[float, float, float]] = None,
                image_size: Tuple[int, int] = DEFAULT_IMAGE_SIZE,
                fov_deg: float = DEFAULT_FOV_DEG) -> PinholeCamera:
    """Build the default mock-CARLA camera in P3D world coordinates
    (z negated vs CARLA, hence ``-elevation``)."""
    eye = (distance, shift, -elevation)
    if look_at is None:
        look_at = (0.0, 0.0, -elevation)
    R, T = look_at_view_transform(eye=eye, at=look_at, up=(0.0, 0.0, -1.0))
    f = focal_px_from_fov(fov_deg)
    w, h = image_size
    return PinholeCamera(R=R, T=T, focal=(f, f),
                         principal=(w / 2.0, h / 2.0), image_size=(w, h))


def project_pose(camera: PinholeCamera,
                 abs_pose_loc: jnp.ndarray,
                 world_loc: Optional[jnp.ndarray] = None,
                 world_rot: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Project absolute (component-space) pose locations to the screen.

    Equivalent to reference ``P3dPoseProjection.forward``
    (``p3d_pose_projection.py:115-152``) but batched over every leading
    dimension at once (the reference loops over frames in Python,
    ``modules/layers/projection.py:107-114``).

    :param abs_pose_loc: (..., J, 3) absolute pose in P3D pose space.
    :param world_loc: broadcastable (..., 3) pedestrian world location.
    :param world_rot: broadcastable (..., 3, 3) pedestrian world rotation.
    :return: (..., J, 3) = (x_screen, y_screen, depth).
    """
    sx, sy, vz = project_pose_planes(
        camera,
        (abs_pose_loc[..., 0], abs_pose_loc[..., 1], abs_pose_loc[..., 2]),
        world_loc=world_loc, world_rot=world_rot)
    return jnp.stack([sx, sy, vz], axis=-1)


def project_pose_planes(camera: PinholeCamera, abs_loc_planes,
                        world_loc: Optional[jnp.ndarray] = None,
                        world_rot: Optional[jnp.ndarray] = None):
    """Plane form of :func:`project_pose`: 3 (..., J) absolute-location
    component planes -> (x_screen, y_screen, depth) planes. The fused
    training path stays in planes end-to-end (trailing 3-dims cost TPU
    relayout pads at every stage boundary)."""
    x, y, z = abs_loc_planes
    # p3d pose -> p3d world axis swap: (x, y, z) -> (y, -x, z), in component
    # form (see PinholeCamera.project_planes for why not batched matmuls)
    wx, wy, wz = y, -x, z
    if world_rot is not None:
        # (..., 3, 3) per-clip rotation broadcast over the joint axis
        r = world_rot[..., None, :, :]
        wx, wy, wz = (
            wx * r[..., 0, 0] + wy * r[..., 1, 0] + wz * r[..., 2, 0],
            wx * r[..., 0, 1] + wy * r[..., 1, 1] + wz * r[..., 2, 1],
            wx * r[..., 0, 2] + wy * r[..., 1, 2] + wz * r[..., 2, 2],
        )
    if world_loc is not None:
        wx = wx + world_loc[..., None, 0]
        wy = wy + world_loc[..., None, 1]
        wz = wz + world_loc[..., None, 2]
    return camera.project_planes(wx, wy, wz)
