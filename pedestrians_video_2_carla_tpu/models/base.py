"""Model-layer foundations: optimizer/scheduler configuration and the
movements-model output helpers.

Capability parity with reference ``modules/flow/base_model.py`` (per-prefix
hparams, AdamW + {ReduceLROnPlateau, StepLR, CosineAnnealingWarmRestarts}) and
``modules/movements/movements.py:68-118`` (``MovementsModelOutputTypeMixin``),
re-designed around optax transformations and flax modules: models are pure
``nn.Module``s; training-time configuration lives in ``OptimizerSettings``.
"""
from dataclasses import dataclass
from typing import Any, Dict, Optional, Type

import jax.numpy as jnp
import optax

from ..flows.output_types import MovementsModelOutputType
from ..ops.rotations import rotation_6d_to_matrix


@dataclass(frozen=True)
class OptimizerSettings:
    """AdamW + optional LR scheduler (reference ``base_model.py:24-199``).

    ``lr=None`` selects the reference's defaults: 5e-2 with scheduler enabled,
    1e-4 without."""
    lr: Optional[float] = None
    enable_lr_scheduler: bool = False
    scheduler_type: str = "ReduceLROnPlateau"
    scheduler_gamma: float = 0.98
    scheduler_step_size: int = 1
    scheduler_min_lr: float = 1e-8
    scheduler_patience: int = 50
    scheduler_cooldown: int = 20
    weight_decay: float = 1e-8

    @property
    def learning_rate(self) -> float:
        if self.lr is not None:
            return self.lr
        return 5e-2 if self.enable_lr_scheduler else 1e-4

    @classmethod
    def from_kwargs(cls, prefix: str, kwargs: Dict[str, Any]) -> "OptimizerSettings":
        """Pick up ``{prefix}_lr`` etc. from flat CLI kwargs."""
        def g(name, default):
            v = kwargs.get(f"{prefix}_{name}")
            return default if v is None else v
        return cls(
            lr=kwargs.get(f"{prefix}_lr"),
            enable_lr_scheduler=bool(g("enable_lr_scheduler", False)),
            scheduler_type=g("scheduler_type", "ReduceLROnPlateau"),
            scheduler_gamma=g("scheduler_gamma", 0.98),
            scheduler_step_size=g("scheduler_step_size", 1),
            scheduler_min_lr=g("scheduler_min_lr", 1e-8),
            scheduler_patience=g("scheduler_patience", 50),
            scheduler_cooldown=g("scheduler_cooldown", 20),
            weight_decay=g("weight_decay", 1e-8),
        )

    def make(self, steps_per_epoch: int = 1) -> optax.GradientTransformationExtraArgs:
        """Build the optax chain. The reference steps its schedulers once per
        EPOCH (Lightning ``interval='epoch'``); optax schedules count
        optimizer steps, so every epoch-granularity quantity here is scaled
        by ``steps_per_epoch`` (the Trainer fills it in from the datamodule).
        ReduceLROnPlateau accumulates one epoch of train losses per plateau
        evaluation, so ``patience``/``cooldown`` count epochs as upstream —
        the one divergence is the monitored series (epoch-MEAN TRAIN loss
        in-jit, vs Lightning's epoch val loss, which lives outside the
        compiled step)."""
        steps_per_epoch = max(1, int(steps_per_epoch))
        base = optax.adamw(self.learning_rate, weight_decay=self.weight_decay)
        if not self.enable_lr_scheduler:
            return optax.with_extra_args_support(base)

        if self.scheduler_type == "ReduceLROnPlateau":
            plateau = optax.contrib.reduce_on_plateau(
                factor=self.scheduler_gamma,
                patience=self.scheduler_patience,
                cooldown=self.scheduler_cooldown,
                accumulation_size=steps_per_epoch,
                min_scale=self.scheduler_min_lr / self.learning_rate,
            )
            return optax.chain(optax.with_extra_args_support(base), plateau)
        if self.scheduler_type == "StepLR":
            sched = optax.exponential_decay(
                init_value=1.0, transition_steps=self.scheduler_step_size
                * steps_per_epoch, decay_rate=self.scheduler_gamma,
                staircase=True)
            return optax.with_extra_args_support(
                optax.chain(base, optax.scale_by_schedule(sched)))
        if self.scheduler_type == "CosineAnnealingWarmRestarts":
            period = max(1, self.scheduler_step_size) * steps_per_epoch
            sched = optax.sgdr_schedule([
                {"init_value": self.learning_rate,
                 "peak_value": self.learning_rate,
                 "decay_steps": period, "warmup_steps": 0,
                 "end_value": self.scheduler_min_lr}
            ] * 64)
            return optax.with_extra_args_support(optax.chain(
                optax.scale_by_adam(),
                optax.add_decayed_weights(self.weight_decay),
                optax.scale_by_learning_rate(sched)))
        raise ValueError(f"Unknown lr scheduler type: {self.scheduler_type}")

    def hparams(self, prefix: str) -> Dict[str, Any]:
        return {
            f"{prefix}_enable_lr_scheduler": self.enable_lr_scheduler,
            f"{prefix}_lr": self.learning_rate,
            f"{prefix}_scheduler_type": self.scheduler_type,
            f"{prefix}_scheduler_gamma": self.scheduler_gamma,
            f"{prefix}_scheduler_step_size": self.scheduler_step_size,
            f"{prefix}_scheduler_min_lr": self.scheduler_min_lr,
            f"{prefix}_scheduler_patience": self.scheduler_patience,
            f"{prefix}_scheduler_cooldown": self.scheduler_cooldown,
            f"{prefix}_weight_decay": self.weight_decay,
        }


def movements_output_features(output_type: MovementsModelOutputType) -> int:
    """Raw per-joint feature count for each output type (reference
    ``movements.py:76-87``)."""
    return {
        MovementsModelOutputType.pose_changes: 6,
        MovementsModelOutputType.relative_rot: 6,
        MovementsModelOutputType.absolute_loc: 3,
        MovementsModelOutputType.absolute_loc_rot: 9,
        MovementsModelOutputType.pose_2d: 2,
    }[output_type]


def format_movements_output(outputs: jnp.ndarray,
                            output_type: MovementsModelOutputType):
    """Raw (B, L, P, x) model output -> projection-module input (reference
    ``movements.py:105-118``: 6D -> rotation matrices)."""
    if output_type in (MovementsModelOutputType.pose_changes,
                       MovementsModelOutputType.relative_rot):
        return rotation_6d_to_matrix(outputs)
    if output_type == MovementsModelOutputType.absolute_loc_rot:
        return outputs[..., :3], rotation_6d_to_matrix(outputs[..., 3:])
    return outputs
