"""Minimal SMPL(-X) body-model joint path in JAX.

The reference pulls ``human_body_prior.BodyModel`` (torch) for one thing only:
posed joint locations ``Jtr`` (``data/smpl/utils.py:61-110``). For joints (not
vertices) the SMPL math reduces exactly to: regress rest joints from the
template mesh, then rigid forward kinematics of axis-angle bone rotations over
the kinematic tree — no blend skinning needed. That is what this module
implements; it loads the standard SMPL/SMPL-X ``model.npz``
(v_template, J_regressor, kintree_table).

Model files are licensed and not shipped; ``load_body_model`` raises a clear
error pointing at the expected location (reference behaves the same through
its NotAvailableException).
"""
import os
from dataclasses import dataclass
from functools import lru_cache
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np

from ...ops.kinematics import forward_kinematics
from ...ops.rotations import axis_angle_to_matrix

SMPL_BODY_MODEL_DIR = os.path.join("models", "smpl-x", "smplx_locked_head")
SMPL_MODELS = {g: os.path.join(g, "model.npz")
               for g in ("male", "female", "neutral")}


@dataclass(frozen=True)
class BodyModelData:
    rest_joints: np.ndarray   # (J, 3) regressed rest-pose joints
    parents: Tuple[int, ...]  # kinematic tree
    #: optional mesh data for linear-blend-skinned vertex posing (the
    #: reference renders meshes through body_visualizer/pyrender GL; here a
    #: software rasterizer consumes these — ``renderers/smpl_renderer.py``)
    v_template: Optional[np.ndarray] = None   # (V, 3)
    skin_weights: Optional[np.ndarray] = None  # (V, J)
    faces: Optional[np.ndarray] = None        # (F, 3) int vertex indices


def load_body_model_npz(path: str, num_joints: Optional[int] = None
                        ) -> BodyModelData:
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"SMPL body model not found at {path}. Download the SMPL-X "
            "locked-head models and place them under "
            f"{SMPL_BODY_MODEL_DIR}/<gender>/model.npz")
    with np.load(path, allow_pickle=True) as data:
        v_template = np.asarray(data["v_template"], dtype=np.float64)
        j_regressor = np.asarray(data["J_regressor"], dtype=np.float64)
        kintree = np.asarray(data["kintree_table"], dtype=np.int64)
        weights = np.asarray(data["weights"], dtype=np.float32) \
            if "weights" in data else None
        faces = np.asarray(data["f"], dtype=np.int64) \
            if "f" in data else None
    joints = j_regressor @ v_template
    parents = kintree[0].copy()
    parents[0] = -1
    if num_joints is not None:
        joints = joints[:num_joints]
        parents = parents[:num_joints]
        if weights is not None:
            # fold trimmed joints' influence into their remaining ancestors
            w = weights.copy()
            for j in range(weights.shape[1] - 1, num_joints - 1, -1):
                anc = int(kintree[0, j])
                while anc >= num_joints:
                    anc = int(kintree[0, anc])
                w[:, anc] += w[:, j]
            weights = w[:, :num_joints]
    return BodyModelData(rest_joints=joints.astype(np.float32),
                         parents=tuple(int(p) for p in parents),
                         v_template=v_template.astype(np.float32),
                         skin_weights=weights, faces=faces)


@lru_cache(maxsize=8)
def get_body_model(gender: str = "neutral",
                   body_model_dir: str = SMPL_BODY_MODEL_DIR,
                   num_joints: Optional[int] = 22) -> BodyModelData:
    """Cached body model, trimmed to ``num_joints`` (default 22 = pelvis +
    21 body joints, the SMPL_SKELETON subset AMASS poses drive — full SMPL
    has 24 joints and SMPL-X 55, so an untrimmed kintree would not match the
    63-dim ``pose_body`` AMASS provides)."""
    return load_body_model_npz(
        os.path.join(body_model_dir, SMPL_MODELS[gender]),
        num_joints=num_joints)


def joint_locations(model: BodyModelData,
                    pose_body: jnp.ndarray,
                    root_orient: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Posed joint locations (``BodyModel(...).Jtr`` equivalent).

    :param pose_body: (..., (J-1)*3) axis-angle body pose (root excluded).
    :param root_orient: (..., 3) axis-angle root orientation (zeros if None).
    :return: (..., J, 3) joint locations in SMPL world coordinates.
    """
    J = len(model.parents)
    pose_body = jnp.asarray(pose_body).reshape(
        pose_body.shape[:-1] + (J - 1, 3))
    if root_orient is None:
        root_orient = jnp.zeros(pose_body.shape[:-2] + (3,),
                                pose_body.dtype)
    full_pose = jnp.concatenate([root_orient[..., None, :], pose_body],
                                axis=-2)
    # column-vector Rodrigues matrices; our FK composes row-vector matrices
    # (v' = v @ R), so transpose
    rot = jnp.swapaxes(axis_angle_to_matrix(full_pose), -1, -2)

    parents_arr = np.asarray(model.parents)
    rest = jnp.asarray(model.rest_joints)
    # pelvis-relative bone offsets (root offset zero; pelvis re-added below)
    rel_loc = jnp.where((parents_arr >= 0)[:, None],
                        rest - rest[np.maximum(parents_arr, 0)], 0.0)
    rel_loc = jnp.broadcast_to(rel_loc, rot.shape[:-2] + (3,))
    abs_loc, _ = forward_kinematics(rel_loc, rot, parents=model.parents)
    return abs_loc + rest[0]


def vertex_locations(model: BodyModelData,
                     pose_body: jnp.ndarray,
                     root_orient: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Linear-blend-skinned mesh vertices (SMPL LBS without pose/shape
    blendshapes — adequate for qualitative rendering; the reference's mesh
    path goes through ``human_body_prior.BodyModel`` + pyrender GL,
    ``renderers/smpl_renderer.py:21-70``).

    :param pose_body: (..., (J-1)*3) axis-angle body pose (root excluded).
    :return: (..., V, 3) posed vertices in SMPL world coordinates.
    """
    if model.v_template is None or model.skin_weights is None:
        raise ValueError("body model was loaded without mesh data "
                         "(v_template/weights)")
    J = len(model.parents)
    pose_body = jnp.asarray(pose_body).reshape(
        pose_body.shape[:-1] + (J - 1, 3))
    if root_orient is None:
        root_orient = jnp.zeros(pose_body.shape[:-2] + (3,), pose_body.dtype)
    full_pose = jnp.concatenate([root_orient[..., None, :], pose_body],
                                axis=-2)
    rot = jnp.swapaxes(axis_angle_to_matrix(full_pose), -1, -2)  # row-vector

    parents_arr = np.asarray(model.parents)
    rest = jnp.asarray(model.rest_joints)                        # (J, 3)
    rel_loc = jnp.where((parents_arr >= 0)[:, None],
                        rest - rest[np.maximum(parents_arr, 0)], 0.0)
    rel_loc = jnp.broadcast_to(rel_loc, rot.shape[:-2] + (3,))
    abs_loc, abs_rot = forward_kinematics(rel_loc, rot, parents=model.parents)
    posed_joints = abs_loc + rest[0]                             # (..., J, 3)

    v = jnp.asarray(model.v_template)                            # (V, 3)
    w = jnp.asarray(model.skin_weights)                          # (V, J)
    # per-joint rigid transform of every vertex, blended by skin weights:
    #   v'_j = (v - rest_j) @ R_j + posed_j   (row-vector convention)
    local = v[:, None, :] - rest[None, :, :]                     # (V, J, 3)
    rotated = jnp.einsum("vja,...jab->...vjb", local, abs_rot)
    blended = jnp.einsum("vj,...vjb->...vb",
                         w, rotated + posed_joints[..., None, :, :])
    return blended
