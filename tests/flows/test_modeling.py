"""End-to-end CLI smoke tests: in-process ``modeling.main()`` with tiny
configs on the synthetic Carla2D3D generator (mirrors reference
``tests/test_modeling.py:11-196`` — the synthetic generator IS the fake
backend; no dataset, TPU, or CARLA server needed)."""
import pytest

from pedestrians_video_2_carla_tpu.modeling import main

BASE = [
    "--mode=train", "--data_module_name=Carla2D3D",
    "--batch_size=4", "--clip_length=4",
    "--val_set_size=4", "--test_set_size=4",
    "--max_epochs=1", "--limit_train_batches=2",
    "--log_every_n_steps=1", "--renderers", "none",
    "--root_dir=/tmp/pv2c_test_outputs",
]


def _run(*extra):
    results = main(BASE + list(extra))
    assert "val_metrics" in results or "test_metrics" in results \
        or "predictions" in results
    return results


@pytest.mark.parametrize("loss_modes", [
    ["loc_2d"], ["loc_2d_3d"], ["cum_pose_changes"], ["loc_2d_loc_rot_3d"],
])
def test_pose_lifting_loss_modes(loss_modes):
    results = _run("--flow=pose_lifting", "--movements_model_name=Linear",
                   "--loss_modes", *loss_modes)
    vm = results["val_metrics"]
    assert "val_loss/primary" in vm
    assert vm["val/MPJPE"] > 0


@pytest.mark.parametrize("model,output_type", [
    ("Linear", "pose_changes"),
    ("Linear", "relative_rot"),
    ("Linear", "absolute_loc"),
    ("LinearAEResidual", "absolute_loc_rot"),
])
def test_pose_lifting_output_types(model, output_type):
    loss = {"pose_changes": "loc_2d", "relative_rot": "loc_2d",
            "absolute_loc": "loc_2d", "absolute_loc_rot": "loc_2d"}[output_type]
    results = _run("--flow=pose_lifting", f"--movements_model_name={model}",
                   f"--movements_output_type={output_type}",
                   "--loss_modes", loss)
    assert results["val_metrics"]["val_loss/primary"] >= 0


def test_help_prints_and_exits_cleanly(capsys):
    # regression: a bare '%' in a help string makes argparse's %(default)s
    # expansion crash --help with a TypeError
    from pedestrians_video_2_carla_tpu.modeling import setup_flow
    with pytest.raises(SystemExit) as e:
        setup_flow(["--help"])
    assert e.value.code == 0
    out = capsys.readouterr().out
    assert "--projection_kernel" in out and "--loss_modes" in out


def test_lr_monitor_and_model_summary(tmp_path):
    # per-step lr logging (reference LearningRateMonitor) + param counts in
    # hparams (reference ModelSummary), incl. the ReduceLROnPlateau scale
    import json
    _run("--flow=pose_lifting", "--movements_model_name=Linear",
         "--loss_modes", "loc_2d", "--movements_enable_lr_scheduler",
         f"--root_dir={tmp_path}", "--run_name=lrmon")
    logdir = tmp_path / "logs" / "pose_lifting" / "lrmon"
    lines = [json.loads(l) for l in
             (logdir / "metrics.jsonl").read_text().splitlines()]
    lr_lines = [l for l in lines if "lr-movements" in l]
    assert lr_lines and lr_lines[0]["lr-movements"] > 0
    hparams = json.loads((logdir / "hparams.json").read_text())
    assert hparams.get("params/movements", 0) > 0


def test_detect_anomaly_aborts_on_non_finite(tmp_path):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import \
        Carla2D3DDataModule
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.models.movements import \
        MOVEMENTS_MODELS
    from pedestrians_video_2_carla_tpu.training.trainer import (Trainer,
                                                                TrainerConfig)

    dm = Carla2D3DDataModule(batch_size=2, clip_length=4, val_set_size=2,
                             test_set_size=2)
    flow = PoseLiftingFlow(movements_model=MOVEMENTS_MODELS["Linear"]())
    trainer = Trainer(flow, dm, TrainerConfig(
        logs_dir=str(tmp_path), run_name="anomaly", detect_anomaly=True))
    trainer._init_state()

    # finite logs + finite params: no-op
    trainer._check_anomaly({"train_loss/primary": 1.0}, 1)

    # non-finite loss -> abort with diagnostic file
    with pytest.raises(RuntimeError, match="detect_anomaly"):
        trainer._check_anomaly({"train_loss/primary": float("nan")}, 2)
    assert (tmp_path / "anomaly" / "anomaly.json").exists()

    # finite-looking loss but poisoned params -> still caught
    poisoned = jax.tree_util.tree_map(
        lambda x: x.at[...].set(jnp.nan) if hasattr(x, "at") else x,
        trainer.state.params)
    trainer.state = trainer.state.replace(params=poisoned)
    with pytest.raises(RuntimeError, match="params"):
        trainer._check_anomaly({"train_loss/primary": 1.0}, 3)


def test_current_lrs_per_model_plateau_attribution():
    # two ReduceLROnPlateau schedulers: scaling one model's plateau state
    # must only change THAT model's reported lr
    import jax
    import jax.numpy as jnp

    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import \
        PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import \
        MOVEMENTS_MODELS

    cfg = Carla2D3DConfig(batch_size=2, clip_length=4)
    batch = generate_batch(jax.random.PRNGKey(0), cfg)
    flow = PoseLiftingFlow(
        movements_model=MOVEMENTS_MODELS["Linear"](),
        movements_optimizer=OptimizerSettings(
            lr=1e-3, enable_lr_scheduler=True),
        trajectory_optimizer=OptimizerSettings(
            lr=1e-2, enable_lr_scheduler=True))
    state = flow.init_state(jax.random.PRNGKey(1), batch)

    def scale_plateau(tree, inside, factor):
        if hasattr(tree, "scale") and hasattr(tree, "plateau_count"):
            return tree._replace(scale=tree.scale * factor) if inside \
                else tree
        if isinstance(tree, dict):
            return {k: scale_plateau(v, inside or k == "trajectory", factor)
                    for k, v in tree.items()}
        if isinstance(tree, tuple):
            vals = [scale_plateau(v, inside, factor) for v in tree]
            return type(tree)(*vals) if hasattr(tree, "_fields") \
                else tuple(vals)
        return tree

    state = state.replace(
        opt_state=scale_plateau(state.opt_state, False, jnp.asarray(0.5)))
    lrs = flow.current_lrs(state)
    assert lrs["lr-movements"] == pytest.approx(1e-3)
    assert lrs["lr-trajectory"] == pytest.approx(5e-3)


def test_pose_lifting_pallas_projection_kernel():
    # --projection_kernel pallas must train end-to-end (Pallas forward in
    # interpret mode on CPU, custom-VJP XLA backward) and produce finite
    # losses/metrics
    results = _run("--flow=pose_lifting", "--movements_model_name=Linear",
                   "--loss_modes", "loc_2d", "--projection_kernel", "pallas")
    vm = results["val_metrics"]
    assert vm["val_loss/primary"] > 0 and vm["val/MPJPE"] > 0


def test_pose_lifting_pallas_train_projection_kernel():
    # --projection_kernel pallas_train: Pallas forward AND hand-written
    # Pallas backward through a 2D+3D loss (both kernel outputs consumed)
    results = _run("--flow=pose_lifting", "--movements_model_name=Linear",
                   "--loss_modes", "loc_2d_3d",
                   "--projection_kernel", "pallas_train")
    vm = results["val_metrics"]
    assert vm["val_loss/primary"] > 0 and vm["val/MPJPE"] > 0


def test_pose_former_pallas_spatial_kernel():
    # --spatial_kernel pallas: the fused spatial-transformer kernel (fwd +
    # hand-written bwd, interpret mode on CPU) must train end-to-end
    results = _run("--flow=pose_lifting",
                   "--movements_model_name=PoseFormer",
                   "--clip_length", "9", "--receptive_frames", "9",
                   "--depth", "1", "--loss_modes", "loc_2d",
                   "--spatial_kernel", "pallas")
    vm = results["val_metrics"]
    assert vm["val_loss/primary"] > 0 and vm["val/MPJPE"] > 0


def test_pose_lifting_lstm_and_weighted_loss():
    results = _run("--flow=pose_lifting", "--movements_model_name=LSTM",
                   "--loss_modes", "weighted_loc_2d_loc_rot_3d",
                   "--loss_weights", "loc_2d=1.0", "loc_3d=1.0", "rot_3d=3.0")
    assert "val_loss/weighted_loc_2d_loc_rot_3d" in results["val_metrics"]


def test_autoencoder_flow_with_noise():
    results = _run("--flow=autoencoder", "--movements_model_name=LinearAE2D",
                   "--noise", "gaussian", "--noise_param", "2.0",
                   "--missing_joint_probabilities_0", "0.1")
    vm = results["val_metrics"]
    assert "val/PCKhn@01" in vm and "val/MSE" in vm


def test_random_run_name_generated(tmp_path):
    """Without --run_name the CLI generates a randomname-style version
    string (reference ``modeling.py:160-161``) whose log dir is reserved
    atomically — concurrent unnamed runs can never collide."""
    import os
    import random

    from pedestrians_video_2_carla_tpu.modeling import known_name
    from pedestrians_video_2_carla_tpu.utils import naming
    from pedestrians_video_2_carla_tpu.utils.naming import (random_run_name,
                                                            unique_run_name)

    name = random_run_name(random.Random(0))
    assert name == random_run_name(random.Random(0))  # seedable
    adj, noun = name.split("-")
    assert adj.isalpha() and noun.isalpha()

    class Args:
        data_module_name = "Carla2D3D"
        run_name = None
        logs_dir = None
        root_dir = str(tmp_path)
        flow = "pose_lifting"

    got = known_name(Args())
    assert got.startswith("Carla2D3D-")
    assert os.path.isdir(tmp_path / "logs" / "pose_lifting" / got)

    # collision exhaustion: with a 1x1 vocabulary every plain draw collides
    # after the first, so the salt must keep names unique and reserved
    orig_a, orig_n = naming._ADJECTIVES, naming._NOUNS
    naming._ADJECTIVES, naming._NOUNS = ("one",), ("two",)
    try:
        names = {unique_run_name(str(tmp_path / "crowded"))
                 for _ in range(10)}
    finally:
        naming._ADJECTIVES, naming._NOUNS = orig_a, orig_n
    assert len(names) == 10
    for n in names:
        assert os.path.isdir(tmp_path / "crowded" / n)


def test_classification_flow():
    import glob
    import os

    results = _run("--flow=classification",
                   "--classification_model_name=LSTM")
    vm = results["val_metrics"]
    assert "val/Accuracy" in vm and "val/AUROC" in vm
    # offline plot artifacts replacing the reference's W&B plots
    # (``classification.py:336-436``): confusion matrix + ROC + PR PNGs
    plots = glob.glob(os.path.join(results["trainer"].log_dir,
                                   "plots", "*.png"))
    assert any("confusion" in os.path.basename(p) for p in plots)
    assert any("roc_curve" in os.path.basename(p) for p in plots)
    assert any("pr_curve" in os.path.basename(p) for p in plots)
    assert all(os.path.getsize(p) > 0 for p in plots)


def test_test_and_predict_modes():
    results = main(BASE[1:] + [
        "--mode=test", "--flow=pose_lifting",
        "--movements_model_name=Linear", "--loss_modes", "loc_2d",
        "--data_module_name=Carla2D3D",
    ])
    assert "test/MPJPE" in results["test_metrics"]

    results = main(BASE[1:] + [
        "--mode=predict", "--flow=pose_lifting",
        "--movements_model_name=Linear", "--loss_modes", "loc_2d",
        "--data_module_name=Carla2D3D", "--predict_sets", "val",
    ])
    assert len(results["predictions"]["val"]) >= 1


def test_seq2seq_teacher_force_decay_hook():
    """Per-epoch teacher-forcing decay (reference ``seq2seq.py`` epoch hook):
    on_epoch_start shrinks the ratio and requests a step rebuild."""
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS

    model = MOVEMENTS_MODELS["Seq2Seq"](
        teacher_mode="clip_force", teacher_force_ratio=0.5,
        teacher_force_drop=0.2)
    flow = PoseLiftingFlow(movements_model=model)
    assert flow.on_epoch_start(0) is False          # epoch 0: keep initial
    assert flow.on_epoch_start(1) is True
    assert flow.movements_model.teacher_force_ratio == pytest.approx(0.3)
    assert flow.on_epoch_start(2) is True
    assert flow.movements_model.teacher_force_ratio == pytest.approx(0.1)
    flow.on_epoch_start(3)
    assert flow.on_epoch_start(4) is False          # ratio hit 0 -> stable
    # no_force models never trigger rebuilds
    flow2 = PoseLiftingFlow(movements_model=MOVEMENTS_MODELS["Seq2Seq"]())
    assert flow2.on_epoch_start(5) is False


def test_classification_initial_preds_prevalent_class():
    """Prevalent-class baseline (reference ``classification.py:259-319``)."""
    import jax.numpy as jnp
    import numpy as np

    from pedestrians_video_2_carla_tpu.flows.classification import \
        ClassificationFlow

    flow = ClassificationFlow()
    labels = jnp.asarray([1, 1, 1, 0])
    preds = flow.initial_preds(None, {"crossing": labels})
    logits = np.asarray(preds["crossing_logits"])
    if flow.binary:
        assert logits.shape == (4,) and (logits > 0).all()
    else:
        assert logits.argmax(-1).tolist() == [1, 1, 1, 1]
    assert flow.initial_preds(None, {}) == {}


def test_train_resume_from_last_checkpoint(tmp_path):
    """save_last + --ckpt_path resume (reference Lightning resume semantics:
    full state for train, weights-only for tune, ``modeling.py:281-285``)."""
    import os

    args = [a for a in BASE if not a.startswith("--root_dir")] + [
        f"--root_dir={tmp_path}", "--flow=pose_lifting",
        "--movements_model_name=Linear", "--loss_modes", "loc_2d"]
    first = main(list(args))
    last = os.path.join(first["trainer"].checkpoints.dirpath, "last")
    assert os.path.exists(last + ".npz")
    step_before = int(first["trainer"].state.step)

    resumed = main(list(args) + [f"--ckpt_path=file://{last}"])
    # training continued from the restored step counter
    assert int(resumed["trainer"].state.step) > step_before

    tuned = main(list(args) + ["--mode=tune", f"--ckpt_path=file://{last}"])
    assert "val_metrics" in tuned

    # --ckpt_path is honored in EVERY mode (reference resolves it for
    # test/predict evaluation too): test mode must evaluate the restored
    # weights, not a fresh init
    tested = main([a for a in args if not a.startswith("--mode")]
                  + ["--mode=test", f"--ckpt_path=file://{last}"])
    import jax
    import numpy as np
    trained = first["trainer"].state.params["movements"]
    evaluated = tested["trainer"].state.params["movements"]
    for a, b in zip(jax.tree_util.tree_leaves(trained),
                    jax.tree_util.tree_leaves(evaluated)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # export mode: serialized StableHLO serving artifact from the checkpoint
    exported = main([a for a in args if not a.startswith("--mode")]
                    + ["--mode=export", f"--ckpt_path=file://{last}"])
    path = exported["export_path"]
    assert os.path.exists(path) and os.path.exists(path + ".json")
    from pedestrians_video_2_carla_tpu.serving import load_inference
    call, meta = load_inference(path)
    import numpy as np
    out = call(np.zeros(meta["input_shapes"][0], np.float32),
               np.zeros(meta["input_shapes"][1], np.int32))
    assert "projection_2d" in out


def test_sweep_runner(tmp_path):
    """Local random-search sweep over the W&B sweep YAML format (reference
    ``configs/sweep/*.yaml``)."""
    import json

    from pedestrians_video_2_carla_tpu.sweep import main as sweep_main

    config = f"""
method: random
metric:
  goal: maximize
  name: hp/PCKhn@01
parameters:
  mode: {{value: train}}
  flow: {{value: autoencoder}}
  data_module_name: {{value: Carla2D3D}}
  movements_model_name: {{value: LinearAE2D}}
  max_epochs: {{value: 1}}
  limit_train_batches: {{value: 2}}
  batch_size: {{value: 4}}
  clip_length: {{value: 4}}
  val_set_size: {{value: 4}}
  test_set_size: {{value: 4}}
  renderers: {{value: [none]}}
  root_dir: {{value: {tmp_path}/runs}}
  lr:
    min: 0.001
    max: 0.01
    distribution: log_uniform
"""
    cfg_path = tmp_path / "sweep.yaml"
    cfg_path.write_text(config)
    best, history = sweep_main([
        "--config", str(cfg_path), "--count", "2",
        "--logs_dir", str(tmp_path / "sweep_logs")])
    assert len(history) == 2
    assert best is not None and best["objective"] is not None
    # the two trials sampled different learning rates
    assert history[0]["params"]["lr"] != history[1]["params"]["lr"]
    lines = [json.loads(line) for line in
             open(tmp_path / "sweep_logs" / "sweep_results.jsonl")]
    assert len(lines) == 2


def test_tpe_bayes_sampler_concentrates():
    """The local bayes method (TPE) must concentrate late suggestions near
    the optimum on a known objective — log-uniform numeric + categorical
    (reference sweeps use ``method: bayes`` via W&B's hosted service,
    ``configs/sweep/carla-recorded_seq2seq-embeddings.yaml:10-14``)."""
    import math

    from pedestrians_video_2_carla_tpu.sweep import TPESampler

    params = {
        "lr": {"min": 0.001, "max": 1.0, "distribution": "log_uniform"},
        "units": {"values": [16, 32, 64]},
        "flow": {"value": "autoencoder"},  # fixed params pass through
    }
    sampler = TPESampler(params, sign=1.0, seed=0)

    def objective(p):
        return -abs(math.log(p["lr"]) - math.log(0.01)) \
            + (1.0 if p["units"] == 32 else 0.0)

    history = []
    for _ in range(30):
        t = sampler.suggest(history)
        assert t["flow"] == "autoencoder"
        history.append({"params": t, "objective": objective(t)})

    late = history[-10:]
    lr_err = sorted(abs(math.log(h["params"]["lr"] / 0.01)) for h in late)
    assert lr_err[len(lr_err) // 2] < 1.5  # median within ~1.5 nats
    assert sum(1 for h in late if h["params"]["units"] == 32) >= 5


def test_sweep_bayes_method_runs_trials(tmp_path):
    """End-to-end ``method: bayes`` sweep: the TPE path (post-startup) must
    drive real modeling runs."""
    from pedestrians_video_2_carla_tpu import sweep as sweep_mod

    config = f"""
method: bayes
metric:
  goal: maximize
  name: hp/PCKhn@01
parameters:
  mode: {{value: train}}
  flow: {{value: autoencoder}}
  data_module_name: {{value: Carla2D3D}}
  movements_model_name: {{value: LinearAE2D}}
  max_epochs: {{value: 1}}
  limit_train_batches: {{value: 2}}
  batch_size: {{value: 4}}
  clip_length: {{value: 4}}
  val_set_size: {{value: 4}}
  test_set_size: {{value: 4}}
  renderers: {{value: [none]}}
  root_dir: {{value: {tmp_path}/runs}}
  lr:
    min: 0.001
    max: 0.01
    distribution: log_uniform
"""
    cfg_path = tmp_path / "sweep.yaml"
    cfg_path.write_text(config)
    orig = sweep_mod.TPESampler.N_STARTUP
    sweep_mod.TPESampler.N_STARTUP = 2  # hit the TPE path by trial 3
    try:
        best, history = sweep_mod.main([
            "--config", str(cfg_path), "--count", "3",
            "--logs_dir", str(tmp_path / "sweep_logs")])
    finally:
        sweep_mod.TPESampler.N_STARTUP = orig
    assert len(history) == 3
    assert best is not None and best["objective"] is not None
    assert all(h.get("objective") is not None for h in history)


def test_committed_configs_parse_against_cli():
    """Every committed sweep/compare YAML must expand to argument lists the
    CLI parser accepts without 'unrecognized arguments' warnings (keeps the
    config library honest against the flag surface)."""
    import glob
    import random
    import warnings

    import yaml

    from pedestrians_video_2_carla_tpu.compare import (_arg_list,
                                                       variants_for)
    from pedestrians_video_2_carla_tpu.modeling import setup_flow
    from pedestrians_video_2_carla_tpu.sweep import (sample_parameter,
                                                     trial_args)

    def assert_parses(args, origin):
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            setup_flow([str(a) for a in args])
        bad = [str(w.message) for w in caught
               if "unrecognized" in str(w.message)]
        assert not bad, f"{origin}: {bad}"

    rng = random.Random(0)
    sweeps = glob.glob("configs/sweep/*.yaml")
    compares = glob.glob("configs/compare/*.yaml")
    assert len(sweeps) >= 4 and len(compares) >= 2
    for path in sweeps:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        trial = {k: sample_parameter(v, rng)
                 for k, v in cfg["parameters"].items()}
        extra = [str(a) for a in cfg.get("command", [])
                 if isinstance(a, str) and a.startswith("--")]
        assert_parses(trial_args(trial, extra), path)
    for path in compares:
        with open(path) as f:
            cfg = yaml.safe_load(f)
        variants = variants_for(cfg)
        assert len(variants) >= 2
        for variant in variants[:3]:
            assert_parses(_arg_list(variant), path)


def test_renderers_write_mp4s(tmp_path):
    """CLI run with renderers produces mp4s in the run's videos dir
    (reference ``tests/test_modeling.py:98-139`` mp4-count assertion)."""
    import glob
    import os

    args = [a for a in BASE if not a.startswith("--root_dir")
            and a not in ("--renderers", "none")] + [
        f"--root_dir={tmp_path}", "--flow=pose_lifting",
        "--movements_model_name=Linear", "--loss_modes", "loc_2d",
        "--renderers", "input_points", "projection_points",
        "--max_videos", "2",
        # throttle = log_every_n_steps * reduction = 1 -> every train step
        # logs videos (reference training-time path, ``flow/base.py:489-510``)
        "--video_saving_frequency_reduction", "1"]
    results = main(args)
    videos = glob.glob(os.path.join(
        results["trainer"].log_dir, "videos", "**", "*.mp4"), recursive=True)
    assert len(videos) >= 1
    assert all(os.path.getsize(v) > 0 for v in videos)
    # both eval-time and training-time videos must exist
    stages = {os.path.basename(v).split("-")[0] for v in videos}
    assert "train" in stages and "val" in stages


def test_torch_checkpoint_import_via_cli(tmp_path):
    """--ckpt_path pointing at a Lightning-style torch .ckpt triggers the
    weight-compatible importer (reference restores torch checkpoints via
    load_from_checkpoint, ``modeling.py:250-265``)."""
    import numpy as np
    import torch
    import torch.nn as nn

    J = 26

    class LinearAE(nn.Module):
        def __init__(self):
            super().__init__()
            in_size, out_size = J * 2, J * 6
            self.__encoder = nn.Sequential(
                nn.Linear(in_size, in_size // 2), nn.ReLU(),
                nn.Linear(in_size // 2, in_size // 4), nn.ReLU(),
                nn.Linear(in_size // 4, in_size // 8), nn.ReLU())
            self.__decoder = nn.Sequential(
                nn.Linear(in_size // 8, out_size // 4), nn.ReLU(),
                nn.Linear(out_size // 4, out_size // 2), nn.ReLU(),
                nn.Linear(out_size // 2, out_size))

    tm = LinearAE()
    ckpt = tmp_path / "reference.ckpt"
    torch.save({"state_dict": {f"movements_model.{k}": v for k, v in
                               tm.state_dict().items()}}, str(ckpt))

    args = [a for a in BASE if not a.startswith("--root_dir")] + [
        f"--root_dir={tmp_path}", "--mode=tune", "--flow=pose_lifting",
        "--movements_model_name=LinearAE", "--loss_modes", "loc_2d",
        f"--ckpt_path={ckpt}"]
    results = main(args)
    assert "val_metrics" in results

    # imported weights actually landed in the restored state (tune mode
    # then takes 2 AdamW steps at lr=1e-4, so allow that small drift --
    # a fresh random init would differ by O(5e-2))
    enc0 = np.asarray(results["trainer"].state.params["movements"]
                      ["Dense_0"]["kernel"])
    expected = tm.state_dict()["_LinearAE__encoder.0.weight"].numpy().T
    np.testing.assert_allclose(enc0, expected, atol=2e-3)


def test_missing_joints_sensitivity_subset(tmp_path):
    """Sensitivity study over a restricted joint set (reference
    ``missing_joints_sensitivity.py:28-70`` runs all 26)."""
    from pedestrians_video_2_carla_tpu.missing_joints_sensitivity import \
        main as sensitivity_main

    args = [a for a in BASE if not a.startswith("--root_dir")
            and a not in ("--renderers", "none")] + [
        f"--root_dir={tmp_path}", "--data_module_name=Carla2D3D",
        "--classification_model_name=LSTM",
        "--joints", "crl_hand__L"]
    metrics = sensitivity_main(args)
    assert set(metrics) == {"baseline", "crl_hand__L"}
    assert "val/Accuracy" in metrics["crl_hand__L"]


def test_compare_runner(tmp_path):
    """compare.py cartesian-product batch runner (reference
    ``compare.py:18-138``): two variants as subprocesses, stdout captured."""
    import glob
    import os

    import yaml

    from pedestrians_video_2_carla_tpu.compare import main as compare_main

    config = {
        "common_params": {
            "mode": "train", "flow": "pose_lifting",
            "data_module_name": "Carla2D3D", "batch_size": 4,
            "clip_length": 4, "val_set_size": 4, "test_set_size": 4,
            "max_epochs": 1, "limit_train_batches": 1,
            "renderers": "none", "loss_modes": "loc_2d",
        },
        "compare_params": {"movements_model_name": ["Linear", "ZeroMovements"]},
    }
    cfg = tmp_path / "compare.yaml"
    cfg.write_text(yaml.safe_dump(config))
    compare_main(["-c", str(cfg), "-r", str(tmp_path / "out"),
                  "-n", "1"])
    outs = glob.glob(str(tmp_path / "out" / "**" / "stdout" / "*.out"),
                     recursive=True)
    assert len(outs) == 2
    assert all(os.path.getsize(o) > 0 for o in outs)


def test_bf16_precision_trains():
    """--precision bf16: model compute in bf16, master params/geometry fp32;
    losses finite and params unchanged in dtype."""
    import jax
    import jax.numpy as jnp

    results = _run("--flow=pose_lifting", "--movements_model_name=LinearAE",
                   "--loss_modes", "loc_2d_3d", "--precision", "bf16")
    flow = results["flow"]
    assert flow.precision == "bf16"
    state = results["trainer"].state
    leaves = jax.tree_util.tree_leaves(state.params)
    assert leaves and all(l.dtype == jnp.float32 for l in leaves)
    assert float(results["val_metrics"]["val/MPJPE"]) >= 0


def test_gradient_clip_val_bounds_update():
    """--gradient_clip_val: the global grad norm is clipped before AdamW, so
    one step from identical states with/without clipping differs once grads
    exceed the clip threshold."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pedestrians_video_2_carla_tpu.data.carla.carla_2d3d import (
        Carla2D3DConfig, generate_batch)
    from pedestrians_video_2_carla_tpu.flows.pose_lifting import PoseLiftingFlow
    from pedestrians_video_2_carla_tpu.losses import LossModes
    from pedestrians_video_2_carla_tpu.models.base import OptimizerSettings
    from pedestrians_video_2_carla_tpu.models.movements import MOVEMENTS_MODELS

    batch = generate_batch(
        jax.random.PRNGKey(0), Carla2D3DConfig(batch_size=2, clip_length=4))
    states = {}
    for clip in (0.0, 1e-6):
        flow = PoseLiftingFlow(
            movements_model=MOVEMENTS_MODELS["Linear"](),
            loss_modes=[LossModes.loc_2d],
            movements_optimizer=OptimizerSettings(lr=1e-2),
            gradient_clip_val=clip)
        state = flow.init_state(jax.random.PRNGKey(1), batch)
        state, logs = jax.jit(flow.training_step)(
            state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(logs["train_loss/primary"]))
        states[clip] = state
    a = jax.tree_util.tree_leaves(states[0.0].params)
    b = jax.tree_util.tree_leaves(states[1e-6].params)
    assert any(not np.allclose(np.asarray(x), np.asarray(y))
               for x, y in zip(a, b))


def test_classification_finetuning_chain(tmp_path):
    """Two-stage chaining (reference ``classification_finetuning.py:44-175``):
    AE predict over all sets -> save_predictions subsets tree -> classifier
    tuned on the AE outputs via --subsets_dir."""
    from pedestrians_video_2_carla_tpu.classification_finetuning import \
        main as cft_main

    results = cft_main([
        "--data_module_name=Carla2D3D", "--batch_size=4", "--clip_length=4",
        "--val_set_size=4", "--test_set_size=4", "--max_epochs=1",
        "--limit_train_batches=2", "--movements_model_name=LinearAE2D",
        "--classification_model_name=LSTM", f"--root_dir={tmp_path}",
    ])
    assert "val_metrics" in results
    assert "val/Accuracy" in results["val_metrics"]


def test_replacement_metric_flow_chain(tmp_path):
    """Three-stage replacement metric (reference
    ``replacement_metric_flow.py:43-``): train model one, predict with it,
    train model two on the predictions, cross-evaluate."""
    from pedestrians_video_2_carla_tpu.replacement_metric_flow import \
        main as rmf_main

    results = rmf_main([
        "--data_module_name=Carla2D3D", "--batch_size=4", "--clip_length=4",
        "--val_set_size=4", "--test_set_size=4", "--max_epochs=1",
        "--limit_train_batches=2", "--movements_model_name=LinearAE2D",
        f"--root_dir={tmp_path}",
    ])
    assert {"model_one", "model_two_on_predictions",
            "cross_eval"} <= set(results)


def test_separated_classification_chain(tmp_path):
    """A/B/C classifier comparison (reference
    ``separated_classification.py:41-``): raw-noisy vs AE-denoised vs clean
    data classification."""
    from pedestrians_video_2_carla_tpu.separated_classification import \
        main as sc_main

    results = sc_main([
        "--data_module_name=Carla2D3D", "--batch_size=4", "--clip_length=4",
        "--val_set_size=4", "--test_set_size=4", "--max_epochs=1",
        "--limit_train_batches=2", "--movements_model_name=LinearAE2D",
        "--classification_model_name=LSTM", f"--root_dir={tmp_path}",
    ])
    assert {"raw_noisy", "ae_denoised", "clean"} <= set(results)


def test_classification_bf16_precision():
    """--precision bf16 in the classification flow: finite loss, fp32 params."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    results = _run("--flow=classification", "--classification_model_name=GRU",
                   "--precision", "bf16")
    state = results["trainer"].state
    leaves = jax.tree_util.tree_leaves(state.params)
    assert leaves and all(l.dtype == jnp.float32 for l in leaves)
    assert np.isfinite(results["val_metrics"]["val_loss/primary"])


def test_wandb_offline_logger(tmp_path):
    """--logger wandb writes a W&B-format offline run dir (reference's
    primary WandbLogger, ``modeling.py:194-224``, zero-egress adapter)."""
    import glob
    import json

    import yaml

    results = main(BASE[:-1] + [f"--root_dir={tmp_path}",
                                "--flow=pose_lifting",
                                "--movements_model_name=Linear",
                                "--loss_modes", "loc_2d",
                                "--logger", "wandb",
                                "--run_name", "wandb_smoke"])
    files_dirs = glob.glob(
        str(tmp_path / "logs" / "pose_lifting" / "wandb_smoke" / "wandb"
            / "offline-run-*-wandb_smoke" / "files"))
    assert len(files_dirs) == 1
    files = files_dirs[0]
    with open(f"{files}/wandb-summary.json") as f:
        summary = json.load(f)
    assert "val_loss/primary" in summary and "_step" in summary
    history = [json.loads(line)
               for line in open(f"{files}/wandb-history.jsonl")]
    assert history and history[-1]["_step"] >= 1
    with open(f"{files}/config.yaml") as f:
        config = yaml.safe_load(f)
    assert config["batch_size"]["value"] == 4
    with open(f"{files}/wandb-metadata.json") as f:
        assert json.load(f)["mode"] == "offline"
    assert results["val_metrics"]["val_loss/primary"] >= 0
