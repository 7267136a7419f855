"""Main CLI & programmatic API (reference ``modeling.py``):

    python -m pedestrians_video_2_carla_tpu --flow=pose_lifting --mode=train \
        --data_module_name=Carla2D3D --movements_model_name=LinearAE ...

Keeps the reference's compositional two-phase argparse contract
(``modeling.py:328-424``): program-level choices are parsed first, then the
chosen flow / datamodule / model classes contribute their own argument groups.
Model arguments are auto-derived from the flax module dataclass fields, so
every model hyperparameter is a flag without per-model parser code.
"""
import argparse
import dataclasses
import sys
import typing
from typing import Any, Dict, List, Optional

from . import data as data_registry
from .flows import available_flows
from .flows.output_types import MovementsModelOutputType
from .losses import LossModes
from .models.base import OptimizerSettings
from .skeletons.base import get_skeleton_type_by_name
from .training.trainer import Trainer, TrainerConfig
from .utils.argparse import boolean, flat_args_as_list_arg, list_arg_as_flat_args

DEFAULT_SEED = 22742

#: module fields that never become CLI flags
_SKIP_FIELDS = {"input_nodes", "output_nodes", "parent", "name",
                "movements_output_type"}


def add_program_args(parser: argparse.ArgumentParser):
    parser.add_argument("--flow", default="pose_lifting",
                        choices=list(available_flows().keys()))
    parser.add_argument("--mode", default="train",
                        choices=["train", "tune", "test", "predict",
                                 "export"])
    parser.add_argument("--data_module_name", default="Carla2D3D")
    parser.add_argument("--predict_sets", nargs="+", default=["test"])
    parser.add_argument("--export_keys", nargs="+", default=None,
                        help="restrict the --mode=export artifact's outputs "
                             "(e.g. projection_2d); unused outputs are "
                             "dead-code-eliminated from the serving graph")
    parser.add_argument("--export_polymorphic_batch", action="store_true",
                        help="export the --mode=export artifact with a "
                             "symbolic batch dimension: one artifact serves "
                             "any batch size (XLA recompiles per distinct "
                             "size at load time); requires the default "
                             "--projection_kernel xla")
    parser.add_argument("--seed", type=int, default=DEFAULT_SEED)
    parser.add_argument("--root_dir", default="outputs")
    parser.add_argument("--logs_dir", default=None)
    parser.add_argument("--run_name", default=None)
    parser.add_argument("--ckpt_path", default=None)
    parser.add_argument("--pretrained_backbone_path", default=None,
                        help="local torchvision ResNet-50/101 state_dict "
                             "(.pth) injected into the pose-estimation "
                             "backbone (reference unipose/overrides.py:33-46"
                             " pretrained=True injection; no network here)")
    parser.add_argument("--prefer_tensorboard", action="store_true")
    parser.add_argument("--logger", default="auto",
                        choices=["auto", "tensorboard", "wandb"],
                        help="'wandb' also writes a W&B-format offline run "
                             "directory (zero-egress replacement for the "
                             "reference's WandbLogger)")
    parser.add_argument("--profile", action="store_true",
                        help="capture a jax.profiler device trace of the fit "
                             "loop under {log_dir}/trace and print host-side "
                             "timing accumulators at exit")
    parser.add_argument("--verbose", "-v", action="store_true",
                        help="logging level INFO (reference --verbose)")
    parser.add_argument("--very_verbose", "-vv", action="store_true",
                        help="logging level DEBUG (reference --very_verbose)")
    parser.add_argument("--renderers", nargs="*", default=["none"])
    parser.add_argument("--source_videos_overlay_skeletons", type=boolean,
                        default=False,
                        help="draw skeleton overlays in the source_videos "
                             "renderer (reference flag of the same name; "
                             "reference default False)")
    parser.add_argument("--source_videos_overlay_bboxes", type=boolean,
                        default=False)
    parser.add_argument("--source_videos_overlay_classes", type=boolean,
                        default=False,
                        help="draw the classification label (e.g. crossing) "
                             "on source-video frames")
    parser.add_argument("--max_videos", type=int, default=4)
    parser.add_argument("--video_saving_frequency_reduction", type=int,
                        default=10)
    parser.add_argument("--merging_method", default="square",
                        choices=["square", "horizontal", "vertical"])
    return parser


def add_trainer_args(parser: argparse.ArgumentParser):
    group = parser.add_argument_group("Trainer")
    group.add_argument("--max_epochs", type=int, default=1)
    group.add_argument("--limit_train_batches", type=int, default=None)
    group.add_argument("--limit_val_batches", type=int, default=None)
    group.add_argument("--limit_test_batches", type=int, default=None)
    group.add_argument("--log_every_n_steps", type=int, default=50)
    group.add_argument("--check_val_every_n_epoch", type=int, default=1)
    group.add_argument("--gradient_clip_val", type=float, default=0.0,
                       help="global-norm gradient clipping (0 = off), the "
                            "Lightning Trainer flag equivalent")
    group.add_argument("--skip_initial_metrics", type=boolean, default=False,
                       help="skip the fit-start input-as-prediction / "
                            "prevalent-class baseline metrics pass")
    group.add_argument("--detect_anomaly", type=boolean, default=False,
                       help="the Lightning Trainer flag: at every log "
                            "interval, abort with a diagnostic dump if any "
                            "logged loss or parameter is NaN/inf (masked "
                            "losses can look finite after params NaN)")
    group.add_argument("--num_devices", type=int, default=None,
                       help="data-parallel mesh size (default: all devices)")
    group.add_argument("--model_devices", type=int, default=1,
                       help="tensor-parallel mesh axis size; large dense "
                            "kernels are sharded over it (default 1 = pure "
                            "data parallel, the reference's DDP equivalent)")
    return parser


def add_datamodule_args(parser: argparse.ArgumentParser):
    group = parser.add_argument_group("DataModule")
    group.add_argument("--batch_size", type=int, default=64)
    group.add_argument("--clip_length", type=int, default=30)
    group.add_argument("--data_nodes", default=None,
                       type=get_skeleton_type_by_name)
    group.add_argument("--input_nodes", default=None,
                       type=get_skeleton_type_by_name)
    group.add_argument("--output_nodes", default=None,
                       type=get_skeleton_type_by_name)
    group.add_argument("--transform", default="hips_neck",
                       choices=["hips_neck", "hips_neck_bbox", "bbox", "none"])
    group.add_argument("--val_set_size", type=int, default=64)
    group.add_argument("--test_set_size", type=int, default=64)
    group.add_argument("--random_changes_each_frame", type=int, default=3)
    group.add_argument("--max_change_in_deg", type=float, default=5.0)
    group.add_argument("--max_world_rot_change_in_deg", type=float, default=0.0)
    group.add_argument("--max_initial_world_rot_change_in_deg", type=float,
                       default=0.0)
    group.add_argument("--noise", default="zero",
                       choices=["zero", "gaussian", "uniform"])
    group.add_argument("--noise_param", type=float, default=1.0)
    group.add_argument("--data_variant", default=None)
    group.add_argument("--source_videos_dir", default=None)
    group.add_argument("--datasets_dir", default="datasets")
    group.add_argument("--outputs_dir", default="outputs")
    group.add_argument("--subsets_dir", default=None)
    group.add_argument("--clip_offset", type=int, default=None)
    group.add_argument("--val_set_frac", type=float, default=0.2)
    group.add_argument("--test_set_frac", type=float, default=0.2)
    group.add_argument("--strong_points", type=float, default=0)
    group.add_argument("--iou_threshold", type=float, default=0.1)
    group.add_argument("--sample_type", default="beh", choices=["beh", "all"])
    group.add_argument("--augment_flip", type=boolean, default=False)
    group.add_argument("--augment_rotate", type=boolean, default=False)
    group.add_argument("--balance_classes", type=boolean, default=False)
    group.add_argument("--label_frames", type=float, default=-1)
    group.add_argument("--classification_targets_key", default=None)
    group.add_argument("--num_classes", type=int, default=2)
    group.add_argument("--classification_average", default="macro")
    group.add_argument("--tte", nargs=2, type=int, default=[30, 60],
                       help="benchmark time-to-event window (reference "
                            "--tte, benchmark_datamodule_mixin.py:4-73)")
    group.add_argument("--train_proportions", nargs="+", type=float,
                       default=None,
                       help="mixed-datamodule member proportions "
                            "(sum to 1, or -1/0 flags as in the reference)")
    group.add_argument("--val_proportions", nargs="+", type=float,
                       default=None)
    group.add_argument("--test_proportions", nargs="+", type=float,
                       default=None)
    group.add_argument("--video_size", nargs=2, type=int, default=[256, 256],
                       help="decoded video frame size (reference "
                            "--frames_target_size)")
    group.add_argument("--crop_to_bbox", type=boolean, default=True,
                       help="square-crop video frames to the pedestrian "
                            "bbox (reference --frames_bbox_crop)")
    group.add_argument("--heatmaps_sigma", type=float, default=3.0)
    group.add_argument("--heatmaps_stride", type=int, default=8)
    group.add_argument("--device_resident", type=boolean, default=False,
                       help="keep whole HDF5 subsets in device HBM and run "
                            "batch gather + preprocessing on-device (no "
                            "per-batch host transfers; subsets are tens of "
                            "MB). Incompatible with video datamodules")
    list_arg_as_flat_args(group, "missing_joint_probabilities", 26, None,
                          float)
    return parser


def add_flow_args(parser: argparse.ArgumentParser):
    group = parser.add_argument_group("Flow")
    group.add_argument("--loss_modes", nargs="+", default=[],
                       type=LossModes.__getitem__,
                       choices=list(LossModes))
    group.add_argument("--loss_weights", nargs="+", default=[],
                       help="e.g. loc_2d=1.0 loc_3d=1.0 rot_3d=3.0")
    group.add_argument("--mask_missing_joints", type=boolean, default=True)
    group.add_argument("--precision", default="32",
                       choices=["32", "16", "bf16"],
                       help="16/bf16 = AMP-style: bf16 model compute, fp32 "
                            "master weights and fp32 FK/projection geometry")
    group.add_argument("--movements_output_type",
                       default="pose_changes",
                       choices=[t.name for t in MovementsModelOutputType])
    group.add_argument("--projection_kernel", default="xla",
                       choices=["xla", "pallas", "pallas_train"],
                       help="pallas = hand-written fused FK+projection TPU "
                            "kernel on the pose_changes forward path (~20%% "
                            "faster forward-only; use for predict/export "
                            "serving). pallas_train = the trainable variant: "
                            "Pallas forward AND hand-written Pallas backward, "
                            "also emits the absolute 3D pose so the XLA FK "
                            "chain drops out of the 2D+3D train step")
    list_arg_as_flat_args(group, "loss_params", 26, None, float)
    return parser


def add_optimizer_args(parser: argparse.ArgumentParser, prefix: str):
    group = parser.add_argument_group(f"{prefix} optimizer")
    # bare --lr applies to every model type unless the prefixed flag is set
    # (the reference sweep configs use the unprefixed form,
    # ``configs/sweep/*.yaml``)
    if not any(a.dest == "lr" for a in parser._actions):
        group.add_argument("--lr", type=float, default=None)
    group.add_argument(f"--{prefix}_lr", type=float, default=None)
    group.add_argument(f"--{prefix}_enable_lr_scheduler", action="store_true")
    group.add_argument(f"--{prefix}_scheduler_type",
                       default="ReduceLROnPlateau",
                       choices=["ReduceLROnPlateau", "StepLR",
                                "CosineAnnealingWarmRestarts"])
    group.add_argument(f"--{prefix}_scheduler_gamma", type=float, default=0.98)
    group.add_argument(f"--{prefix}_scheduler_step_size", type=int, default=1)
    group.add_argument(f"--{prefix}_scheduler_min_lr", type=float,
                       default=1e-8)
    group.add_argument(f"--{prefix}_scheduler_patience", type=int, default=50)
    group.add_argument(f"--{prefix}_scheduler_cooldown", type=int, default=20)
    group.add_argument(f"--{prefix}_weight_decay", type=float, default=1e-8)
    return parser


def _cli_type(tp):
    origin = typing.get_origin(tp)
    if origin is typing.Union:  # Optional[T]
        args = [a for a in typing.get_args(tp) if a is not type(None)]
        return _cli_type(args[0]) if args else None
    if tp in (int, float, str):
        return tp
    if tp is bool:
        return boolean
    return None


def add_model_args(parser: argparse.ArgumentParser, model_cls,
                   seen: set) -> None:
    """Auto-derive flags from the model's dataclass fields."""
    if not dataclasses.is_dataclass(model_cls):
        return
    group = parser.add_argument_group(model_cls.__name__)
    for f in dataclasses.fields(model_cls):
        if f.name in _SKIP_FIELDS or f.name.startswith("_") \
                or f.name in seen:
            continue
        tp = _cli_type(f.type) if not isinstance(f.type, str) else {
            "int": int, "float": float, "str": str, "bool": boolean,
            "Optional[int]": int, "Optional[float]": float,
        }.get(f.type)
        if tp is None:
            continue
        default = f.default if f.default is not dataclasses.MISSING else None
        try:
            group.add_argument(f"--{f.name}", type=tp, default=default)
            seen.add(f.name)
        except argparse.ArgumentError:
            pass


def discover_available_classes():
    return available_flows(), data_registry.discover()


def _model_kwargs(model_cls, args_dict: Dict[str, Any]) -> Dict[str, Any]:
    if not dataclasses.is_dataclass(model_cls):
        return {}
    names = {f.name for f in dataclasses.fields(model_cls)}
    return {k: v for k, v in args_dict.items()
            if k in names and v is not None and k not in _SKIP_FIELDS}


def setup_flow(argv: List[str]):
    flows, datamodules = discover_available_classes()

    phase1 = argparse.ArgumentParser(add_help=False)
    add_program_args(phase1)
    known, _ = phase1.parse_known_args(argv)

    flow_cls = flows[known.flow]
    dm_cls = datamodules[known.data_module_name]

    parser = argparse.ArgumentParser(
        prog="pedestrians_video_2_carla_tpu",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    add_program_args(parser)
    add_trainer_args(parser)
    add_datamodule_args(parser)
    add_flow_args(parser)

    model_types = flow_cls.get_available_models()
    seen: set = set()
    model_choices = {}
    for model_type, models in model_types.items():
        default_model = flow_cls.get_default_models().get(model_type)
        parser.add_argument(
            f"--{model_type}_model_name",
            default=default_model.__name__ if default_model else None,
            choices=list(models.keys()))
        add_optimizer_args(parser, model_type)
        # peek the chosen model to add its args
        peek = argparse.ArgumentParser(add_help=False)
        peek.add_argument(f"--{model_type}_model_name",
                          default=default_model.__name__ if default_model
                          else None)
        peeked, _ = peek.parse_known_args(argv)
        chosen_name = getattr(peeked, f"{model_type}_model_name")
        if chosen_name:
            model_choices[model_type] = models[chosen_name]
            add_model_args(parser, models[chosen_name], seen)

    args, unknown = parser.parse_known_args(argv)
    if unknown:
        # tolerate other flows' flags so multi-stage scripts can pass one
        # argument list through every stage (reference scripts mutate a
        # Namespace instead)
        import warnings
        warnings.warn(f"ignoring unrecognized arguments: {unknown}")
    return args, flow_cls, dm_cls, model_choices


def main(argv: Optional[List[str]] = None) -> Dict[str, Any]:
    argv = argv if argv is not None else sys.argv[1:]
    args, flow_cls, dm_cls, model_choices = setup_flow(argv)
    args_dict = vars(args)

    if args.very_verbose or args.verbose:
        import logging
        logging.basicConfig(
            level=logging.DEBUG if args.very_verbose else logging.INFO)

    import os

    import jax
    import numpy as np

    # honor JAX_PLATFORMS even when a sitecustomize plugin (e.g. the axon TPU
    # tunnel) registered its backend before this process saw the variable.
    # NOTE: must not touch jax.default_backend() first — probing it would
    # initialize (and pin) the pre-registered backend.
    platforms = os.environ.get("JAX_PLATFORMS")
    if platforms:
        try:
            jax.config.update("jax_platforms", platforms)
        except Exception:
            pass

    # persistent compilation cache: repeated runs of the same config skip
    # the 20-300 s TPU train-step compiles entirely (utils/compile_cache.py)
    from .utils.compile_cache import enable_persistent_compilation_cache
    enable_persistent_compilation_cache()

    # ---- build models -------------------------------------------------
    skeleton_kwargs = {}
    data_nodes = args.data_nodes \
        or getattr(dm_cls, "default_data_nodes", None)
    input_nodes = args.input_nodes or data_nodes
    if input_nodes is not None:
        skeleton_kwargs["input_nodes"] = input_nodes
    output_nodes = args.output_nodes or input_nodes
    mot = MovementsModelOutputType[args.movements_output_type]

    models = {}
    for model_type, model_cls in model_choices.items():
        kwargs = _model_kwargs(model_cls, args_dict)
        kwargs.update({k: v for k, v in skeleton_kwargs.items()
                       if k in {f.name for f in dataclasses.fields(model_cls)}})
        field_names = {f.name for f in dataclasses.fields(model_cls)}
        if "output_nodes" in field_names and output_nodes is not None:
            kwargs["output_nodes"] = output_nodes
        if "movements_output_type" in field_names:
            defaults = model_cls.supported_output_types() \
                if hasattr(model_cls, "supported_output_types") else None
            if defaults is None or mot in defaults:
                kwargs["movements_output_type"] = mot
        if "num_classes" in field_names:
            kwargs["num_classes"] = args.num_classes
        models[f"{model_type}_model"] = model_cls(**kwargs)

    # ---- build flow ----------------------------------------------------
    loss_weights = dict(w.split("=") for w in args.loss_weights)
    loss_weights = {k: float(v) for k, v in loss_weights.items()}
    flow_kwargs = dict(
        loss_modes=args.loss_modes,
        loss_weights=loss_weights,
        loss_params=flat_args_as_list_arg(args_dict, "loss_params"),
        mask_missing_joints=args.mask_missing_joints,
        transform=args.transform,
        precision=args.precision,
        gradient_clip_val=args.gradient_clip_val,
        projection_kernel=args.projection_kernel,
        classification_targets_key=args.classification_targets_key
        or "crossing",
        classification_average=args.classification_average,
        num_classes=args.num_classes,
    )
    for model_type in model_choices:
        if args_dict.get(f"{model_type}_lr") is None \
                and args_dict.get("lr") is not None:
            args_dict[f"{model_type}_lr"] = args_dict["lr"]
        flow_kwargs[f"{model_type}_optimizer"] = \
            OptimizerSettings.from_kwargs(model_type, args_dict)
    flow = flow_cls(**models, **flow_kwargs)

    # ---- build datamodule ---------------------------------------------
    dm_kwargs = dict(
        batch_size=args.batch_size, clip_length=args.clip_length,
        transform=args.transform,
        needs_confidence=flow.needs_confidence,
        needs_heatmaps=flow.needs_heatmaps,
        val_set_size=args.val_set_size, test_set_size=args.test_set_size,
        random_changes_each_frame=args.random_changes_each_frame,
        max_change_in_deg=args.max_change_in_deg,
        max_world_rot_change_in_deg=args.max_world_rot_change_in_deg,
        max_initial_world_rot_change_in_deg=
        args.max_initial_world_rot_change_in_deg,
        noise=args.noise, noise_param=args.noise_param,
        missing_joint_probabilities=flat_args_as_list_arg(
            args_dict, "missing_joint_probabilities"),
        seed=args.seed,
        datasets_dir=args.datasets_dir, outputs_dir=args.outputs_dir,
        subsets_dir=args.subsets_dir, clip_offset=args.clip_offset,
        val_set_frac=args.val_set_frac, test_set_frac=args.test_set_frac,
        strong_points=args.strong_points, iou_threshold=args.iou_threshold,
        sample_type=args.sample_type,
        augment_flip=args.augment_flip, augment_rotate=args.augment_rotate,
        device_resident=args.device_resident,
        balance_classes=args.balance_classes, label_frames=args.label_frames,
        num_classes=args.num_classes,
        tte=tuple(args.tte),
        video_size=tuple(args.video_size), crop_to_bbox=args.crop_to_bbox,
        heatmaps_sigma=args.heatmaps_sigma,
        heatmaps_stride=args.heatmaps_stride,
    )
    for prop in ("train_proportions", "val_proportions", "test_proportions"):
        if getattr(args, prop) is not None:
            dm_kwargs[prop] = getattr(args, prop)
    if args.classification_targets_key:
        dm_kwargs["classification_targets_key"] = \
            args.classification_targets_key
    if args.data_variant:
        dm_kwargs["data_variant"] = args.data_variant
    if args.source_videos_dir:
        dm_kwargs["source_videos_dir"] = args.source_videos_dir
    if data_nodes is not None:
        dm_kwargs["data_nodes"] = data_nodes
    if input_nodes is not None:
        dm_kwargs["input_nodes"] = input_nodes
    if args.subsets_dir:
        # train/eval directly over an existing subsets tree (e.g. saved
        # predictions) regardless of which datamodule produced it
        from .data.base.subsets_datamodule import SubsetsDataModule
        dm_cls = SubsetsDataModule
    import inspect
    sig_params = set()
    for klass in dm_cls.__mro__:
        if hasattr(klass, "__init__"):
            sig_params |= set(
                inspect.signature(klass.__init__).parameters.keys())
    dm = dm_cls(**{k: v for k, v in dm_kwargs.items() if k in sig_params
                   or "kwargs" in sig_params})

    # ---- trainer --------------------------------------------------------
    from .parallel.mesh import MeshConfig
    run_name = args.run_name or known_name(args)
    config = TrainerConfig(
        max_epochs=args.max_epochs,
        limit_train_batches=args.limit_train_batches,
        limit_val_batches=args.limit_val_batches,
        limit_test_batches=args.limit_test_batches,
        log_every_n_steps=args.log_every_n_steps,
        check_val_every_n_epoch=args.check_val_every_n_epoch,
        seed=args.seed,
        mesh=MeshConfig(data_axis_size=args.num_devices,
                        model_axis_size=args.model_devices),
        logs_dir=args.logs_dir or f"{args.root_dir}/logs/{args.flow}",
        run_name=run_name,
        detect_anomaly=args.detect_anomaly,
        skip_initial_metrics=args.skip_initial_metrics,
        logger=args.logger,
    )
    video_logger = None
    renderers = [r for r in (args.renderers or []) if r != "none"]
    if renderers:
        from .loggers.pedestrian_logger import PedestrianLogger
        from .skeletons import CARLA_SKELETON
        video_logger = PedestrianLogger(
            save_dir=f"{config.logs_dir}/{run_name}/videos",
            renderers=renderers,
            input_nodes=input_nodes or CARLA_SKELETON,
            output_nodes=output_nodes or input_nodes or CARLA_SKELETON,
            log_every_n_steps=args.log_every_n_steps,
            max_videos=args.max_videos,
            video_saving_frequency_reduction=
            args.video_saving_frequency_reduction,
            merging_method=args.merging_method,
            source_videos_dir=args.source_videos_dir,
            overlay_skeletons=args.source_videos_overlay_skeletons,
            overlay_bboxes=args.source_videos_overlay_bboxes,
            overlay_classes=args.source_videos_overlay_classes)
    trainer = Trainer(flow, dm, config, video_logger=video_logger)

    dm.prepare_data()
    dm.setup(args.mode)

    results: Dict[str, Any] = {"trainer": trainer, "flow": flow, "dm": dm}
    if args.pretrained_backbone_path:
        # torchvision ResNet pretrained-weight injection into the UniPose/P0
        # backbone (reference ``unipose/overrides.py:33-46``); applied before
        # any checkpoint restore so a full checkpoint wins
        trainer.restore_pretrained_backbone(args.pretrained_backbone_path)
    if args.ckpt_path:
        # --ckpt_path is honored in EVERY mode (reference resolves it for
        # train resume, tune weight-reload, test/predict evaluation alike;
        # ``modeling.py:281-302``)
        from .training.checkpoint import resolve_ckpt_path
        resolved = resolve_ckpt_path(args.ckpt_path)
        if resolved.endswith((".ckpt", ".pth", ".pt")):
            # torch/Lightning checkpoint -> weight-compatible import
            trainer.restore_torch(resolved, args.movements_model_name)
        else:
            trainer.restore(resolved,
                            weights_only=(args.mode != "train"))
    if args.mode in ("train", "tune"):
        if args.profile:
            import os as _os

            from .utils.profiling import device_trace, print_timing
            with device_trace(_os.path.join(trainer.log_dir, "trace")):
                trainer.fit()
            print_timing()
        else:
            trainer.fit()
        results["val_metrics"] = trainer.evaluate(
            "val", config.limit_val_batches)
    elif args.mode == "test":
        results["test_metrics"] = trainer.test()
    elif args.mode == "predict":
        predictions = {}
        for set_name in args.predict_sets:
            predictions[set_name] = trainer.predict(set_name)
        results["predictions"] = predictions
    elif args.mode == "export":
        # serving artifact: bake the (restored) weights into a serialized
        # StableHLO inference function (serving.py; TPU-native extension)
        import numpy as _np

        from .serving import export_inference
        sample = trainer._init_state()
        path = os.path.join(trainer.log_dir, "exported", "model.jaxexp")
        results["export_path"] = export_inference(
            flow, trainer.state, _np.asarray(sample[0]),
            _np.asarray(sample[2]["age_gender_idx"]), path,
            output_keys=tuple(args.export_keys) if args.export_keys else None,
            polymorphic_batch=args.export_polymorphic_batch)
        print(f"exported inference artifact: {path}")
    return results


def known_name(args) -> str:
    """Generated run name when ``--run_name`` is absent: a randomname-style
    ``adjective-noun`` version string (reference ``modeling.py:160-161``),
    prefixed with the datamodule so runs group naturally on disk. The name's
    log dir is reserved atomically so concurrent unnamed runs (sweep.py
    trials, compare.py's thread pool) can never share a run directory."""
    from .utils.naming import unique_run_name
    logs_dir = args.logs_dir or f"{args.root_dir}/logs/{args.flow}"
    return unique_run_name(logs_dir, prefix=f"{args.data_module_name}-")


def run():
    main()


if __name__ == "__main__":
    run()
