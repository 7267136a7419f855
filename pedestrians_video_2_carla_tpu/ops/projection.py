"""Fused differentiable projection pipeline: model output -> 3D pose -> world
placement -> 2D screen projection, fully batched over (batch, frame).

Re-designs reference ``modules/layers/projection.py:19-226`` (``ProjectionModule``):
instead of building one ``ControlledPedestrian`` Python object per clip per batch
and looping frames (`projection.py:52-71,107-114,170-195`), the per-clip reference
skeleton is selected by an age/gender gather on stacked tensors, the across-frame
rotation recurrence is an associative scan, and the whole pipeline is one
jit-compiled pure function — differentiable end-to-end for the 2D/3D losses.
"""
from typing import Dict, NamedTuple, Optional, Tuple, Union

import jax.numpy as jnp

from ..flows.output_types import (MovementsModelOutputType,
                                  TrajectoryModelOutputType)
from ..skeletons.carla import reference_poses_tensor
from . import camera as C
from . import kinematics as K
from .kinematics import _pack9, _unpack9
from .reference_skeletons import denormalize_from_abs


class ProjectionState(NamedTuple):
    """Per-batch constants the projection needs (reference builds these in
    ``on_batch_start``, `projection.py:52-71`)."""
    rel_loc: jnp.ndarray            # (B, 26, 3) reference relative locations
    rel_rot: jnp.ndarray            # (B, 26, 3, 3) reference relative rotations
    age_gender_idx: jnp.ndarray     # (B,) int index into AGE_GENDER_KEYS
    initial_world_loc: Optional[jnp.ndarray] = None  # (B, 3)
    initial_world_rot: Optional[jnp.ndarray] = None  # (B, 3, 3)


def projection_state_for(age_gender_idx: jnp.ndarray) -> ProjectionState:
    """Gather the per-clip reference skeleton tensors for a batch of
    age/gender indices."""
    locs, rots = reference_poses_tensor()
    return ProjectionState(
        rel_loc=jnp.asarray(locs)[age_gender_idx],
        rel_rot=jnp.asarray(rots)[age_gender_idx],
        age_gender_idx=jnp.asarray(age_gender_idx),
    )


class ProjectionModule:
    """Static-config projection pipeline. Instances are cheap, stateless
    callables safe to close over in jit."""

    def __init__(self,
                 movements_output_type: MovementsModelOutputType =
                 MovementsModelOutputType.pose_changes,
                 trajectory_output_type: TrajectoryModelOutputType =
                 TrajectoryModelOutputType.changes,
                 camera: Optional[C.PinholeCamera] = None,
                 kernel: str = "xla") -> None:
        self.movements_output_type = movements_output_type
        self.trajectory_output_type = trajectory_output_type
        self.camera = camera if camera is not None else C.make_camera()
        if kernel not in ("xla", "pallas", "pallas_train"):
            raise ValueError(f"unknown projection kernel {kernel!r}")
        #: "pallas" routes the projections through the hand-written fused
        #: TPU kernel (``ops/pallas/fused_projection.py``) on the
        #: pose_changes + identity-world fast path — ~20% faster forward
        #: than the XLA plane path at batch >= 512 (see docs/PERFORMANCE.md),
        #: intended for inference/serving where only the 2D output is
        #: consumed. "pallas_train" is the trainable variant: Pallas forward
        #: AND hand-written Pallas backward, and the kernel also emits the
        #: absolute pose locations — so for a 2D+3D loss stack the XLA FK
        #: chain dead-code-eliminates out of the train step entirely. Other
        #: configs (relative_rot, world track) and the rotation outputs
        #: always use the XLA plane path; under jit the unused one is
        #: dead-code-eliminated.
        self.kernel = kernel

    def __call__(self,
                 state: ProjectionState,
                 pose_inputs: Union[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]],
                 world_loc_inputs: Optional[jnp.ndarray] = None,
                 world_rot_inputs: Optional[jnp.ndarray] = None,
                 ) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
        """Returns ``(projections (B, L, J, 3), outputs dict)`` with the same
        keys as reference ``projection.py:116-123``."""
        mot = self.movements_output_type

        relative_loc = relative_rot = absolute_rot = None
        abs_loc_planes = None  # plane-fused path (no (...,3,3) relayouts)
        if mot in (MovementsModelOutputType.pose_changes,
                   MovementsModelOutputType.relative_rot):
            # fused plane path: unpack the model's rotation matrices once and
            # stay in (B, L, J) component planes through the rotation
            # accumulation, FK, and camera — trailing (3, 3)/(3,) dims tile
            # to (8, 128) on TPU and every materialized stage boundary costs
            # a relayout pad (measured ~55% of the train step's device time
            # in the naive formulation)
            if pose_inputs.ndim < 5:
                raise RuntimeError(
                    f"{mot.name} input must be (B, L, J, 3, 3) "
                    "rotation matrices")
            if pose_inputs.shape[2] != state.rel_loc.shape[1]:
                # validate bone count up front: the CARLA-schedule gathers in
                # fk_planes clamp out-of-bounds indices silently under jit,
                # so a wrong J would produce garbage instead of raising
                raise RuntimeError(
                    f"{mot.name} input has {pose_inputs.shape[2]} joints, "
                    f"skeleton has {state.rel_loc.shape[1]}")
            B, clip_length = pose_inputs.shape[:2]
            if mot == MovementsModelOutputType.pose_changes:
                rel9 = K.accumulate9(
                    _unpack9(pose_inputs), _unpack9(state.rel_rot[:, None]))
            else:
                rel9 = _unpack9(pose_inputs)
            loc_planes = tuple(
                jnp.broadcast_to(state.rel_loc[:, None, :, i],
                                 (B, clip_length, state.rel_loc.shape[1]))
                for i in range(3))
            abs_loc_planes, abs_rot9 = K.fk_planes(loc_planes, rel9)
            # packed outputs for losses/metrics that want matrices; unused
            # ones are dead-code-eliminated inside the jitted train step
            relative_rot = pose_inputs \
                if mot == MovementsModelOutputType.relative_rot \
                else _pack9(rel9)
            absolute_rot = _pack9(abs_rot9)
            absolute_loc = jnp.stack(abs_loc_planes, axis=-1)
            relative_loc = jnp.broadcast_to(
                state.rel_loc[:, None],
                (state.rel_loc.shape[0], clip_length) + state.rel_loc.shape[1:])
        elif mot == MovementsModelOutputType.absolute_loc:
            if pose_inputs.ndim < 4:
                raise RuntimeError(
                    "absolute_loc input must be (B, L, J, 3) locations")
            absolute_loc = denormalize_from_abs(
                pose_inputs, state.age_gender_idx, autonormalize=True)
        elif mot == MovementsModelOutputType.absolute_loc_rot:
            if not isinstance(pose_inputs, tuple):
                raise RuntimeError(
                    "absolute_loc_rot input must be a (loc, rot) tuple")
            absolute_loc = denormalize_from_abs(
                pose_inputs[0], state.age_gender_idx, autonormalize=True)
            absolute_rot = pose_inputs[1]
        else:
            raise RuntimeError(f"unsupported output type {mot}")

        world_loc, world_rot = self._world(
            state, absolute_loc, world_loc_inputs, world_rot_inputs)
        # identity world track (no trajectory/world inputs): skip the world
        # transform in the projection — the broadcast zeros/identity arrays
        # still go into the outputs dict for metrics/predictions
        identity_world = (
            self.trajectory_output_type == TrajectoryModelOutputType.changes
            and world_loc_inputs is None and world_rot_inputs is None
            and state.initial_world_loc is None
            and state.initial_world_rot is None)
        w_loc = None if identity_world else world_loc
        w_rot = None if identity_world else world_rot

        if (self.kernel == "pallas_train" and identity_world
                and mot == MovementsModelOutputType.pose_changes):
            from .pallas.fused_projection import fused_projection_train
            # the kernel's abs_loc replaces the XLA FK output, so for losses
            # that only consume projection_2d/absolute_pose_loc the whole
            # XLA accumulate9/fk_planes chain above is dead code under jit
            projections, absolute_loc = fused_projection_train(
                pose_inputs, state.rel_loc, state.rel_rot, self.camera)
        elif (self.kernel == "pallas" and identity_world
                and mot == MovementsModelOutputType.pose_changes):
            from .pallas.fused_projection import fused_projection
            projections = fused_projection(
                pose_inputs, state.rel_loc, state.rel_rot, self.camera)
        elif abs_loc_planes is not None:
            sx, sy, vz = C.project_pose_planes(
                self.camera, abs_loc_planes, world_loc=w_loc, world_rot=w_rot)
            projections = jnp.stack([sx, sy, vz], axis=-1)
        else:
            projections = C.project_pose(
                self.camera, absolute_loc, world_loc=w_loc, world_rot=w_rot)

        return projections, {
            "relative_pose_loc": relative_loc,
            "relative_pose_rot": relative_rot,
            "absolute_pose_loc": absolute_loc,
            "absolute_pose_rot": absolute_rot,
            "world_loc": world_loc,
            "world_rot": world_rot,
        }

    def _world(self, state: ProjectionState, absolute_loc,
               world_loc_inputs, world_rot_inputs):
        batch_size, clip_length = absolute_loc.shape[:2]
        if self.trajectory_output_type == TrajectoryModelOutputType.changes:
            return K.world_from_changes(
                (batch_size, clip_length), world_loc_inputs, world_rot_inputs,
                state.initial_world_loc, state.initial_world_rot,
                dtype=absolute_loc.dtype)
        # loc_rot: direct per-frame world transforms
        if world_loc_inputs is None:
            world_loc_inputs = jnp.zeros(
                (batch_size, clip_length, 3), dtype=absolute_loc.dtype)
        if world_rot_inputs is None:
            world_rot_inputs = jnp.broadcast_to(
                jnp.eye(3, dtype=absolute_loc.dtype),
                (batch_size, clip_length, 3, 3))
        return world_loc_inputs, world_rot_inputs
