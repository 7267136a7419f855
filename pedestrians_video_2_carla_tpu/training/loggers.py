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
