"""Scalar/hparam logging: JSONL + CSV on disk, optional TensorBoard if the
writer is importable (the reference logs to W&B/TensorBoard, ``modeling.py:
194-238``; in a zero-egress TPU pod local files are the primary channel)."""
import json
import os
import time
from typing import Any, Dict


class MetricsLogger:
    def __init__(self, log_dir: str, enabled: bool = True):
        #: ``enabled=False`` on non-zero hosts: multi-host runs must not race
        #: on the shared log files (reference: Lightning rank_zero_only)
        self.enabled = enabled
        self.log_dir = log_dir
        self._jsonl = None
        self._tb = None
        if not enabled:
            return
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        if not self.enabled:
            return
        record = {"step": step, "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def log_video(self, tag: str, video, step: int, fps: float = 30.0
                  ) -> None:
        """Forward a rendered (T, H, W, C) uint8 clip to TensorBoard
        (reference ``flow/base.py:480-487`` ``add_video``); silently skipped
        when TB (or its moviepy dependency) is unavailable."""
        if not self.enabled or self._tb is None:
            return
        import importlib.util
        if importlib.util.find_spec("moviepy") is None:
            return  # torch's add_video encoder needs moviepy
        try:
            import numpy as np
            import torch
            vid = torch.from_numpy(
                np.ascontiguousarray(video)).permute(0, 3, 1, 2)[None]
            self._tb.add_video(tag, vid, global_step=step, fps=int(fps))
        except Exception:
            pass

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        if not self.enabled:
            return
        path = os.path.join(self.log_dir, "hparams.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        existing.update({k: _jsonable(v) for k, v in hparams.items()})
        with open(path, "w") as f:
            json.dump(existing, f, indent=1)

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)


class WandbOfflineLogger(MetricsLogger):
    """W&B-compatible offline run-directory writer (no network, no wandb
    package). The reference's primary logger is ``WandbLogger`` (entity
    ``carla-pedestrians``, project = flow name; ``modeling.py:194-224``); in
    this zero-egress environment ``--logger wandb`` writes the W&B run-dir
    *files* layout locally instead:

        {logs_dir}/wandb/offline-run-{YYYYMMDD_HHMMSS}-{run_id}/files/
            config.yaml           # wandb config format ({key: {value: ...}})
            wandb-metadata.json   # program/args/host metadata
            wandb-summary.json    # latest value per metric (wandb summary)
            wandb-history.jsonl   # per-step history rows (_step/_timestamp)

    These are the documented file formats the W&B UI/importers consume; the
    binary ``.wandb`` transaction log requires the wandb package, so
    ``tools/wandb_replay.py`` replays these dirs into real (syncable) W&B
    runs wherever the package IS installed (``wandb.init()`` + per-row
    ``wandb.log``; round-trip tested in
    ``tests/test_training.py::test_wandb_replay_roundtrip``). Scalars/
    hparams also go through the normal jsonl/TB channels (superclass)."""

    def __init__(self, log_dir: str, enabled: bool = True,
                 run_id: str = "run", project: str = "pv2c",
                 entity: str = "carla-pedestrians", argv=None):
        super().__init__(log_dir, enabled=enabled)
        self._summary: Dict[str, Any] = {}
        self._files = None
        if not enabled:
            return
        stamp = time.strftime("%Y%m%d_%H%M%S")
        self._files = os.path.join(
            log_dir, "wandb", f"offline-run-{stamp}-{run_id}", "files")
        os.makedirs(self._files, exist_ok=True)
        meta = {
            "run_id": run_id, "project": project, "entity": entity,
            "program": argv[0] if argv else "pedestrians_video_2_carla_tpu",
            "args": list(argv[1:]) if argv else [],
            "startedAt": time.strftime("%Y-%m-%dT%H:%M:%S"),
            "mode": "offline",
        }
        with open(os.path.join(self._files, "wandb-metadata.json"),
                  "w") as f:
            json.dump(meta, f, indent=1)
        self._history = open(
            os.path.join(self._files, "wandb-history.jsonl"), "a")

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        super().log_scalars(step, scalars)
        if self._files is None:
            return
        row = {"_step": step, "_timestamp": time.time(),
               **{k: v for k, v in scalars.items()
                  if isinstance(v, (int, float))}}
        self._history.write(json.dumps(row) + "\n")
        self._history.flush()
        self._summary.update(row)
        with open(os.path.join(self._files, "wandb-summary.json"),
                  "w") as f:
            json.dump(self._summary, f)

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        super().log_hparams(hparams)
        if self._files is None:
            return
        import yaml
        path = os.path.join(self._files, "config.yaml")
        config = {}
        if os.path.exists(path):
            with open(path) as f:
                config = yaml.safe_load(f) or {}
        config.update({k: {"value": _jsonable(v)}
                       for k, v in hparams.items()})
        with open(path, "w") as f:
            yaml.safe_dump(config, f)

    def close(self):
        if self._files is not None:
            self._history.close()
        super().close()
