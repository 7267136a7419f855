"""Scalar/hparam logging: JSONL + CSV on disk, optional TensorBoard if the
writer is importable (the reference logs to W&B/TensorBoard, ``modeling.py:
194-238``; in a zero-egress TPU pod local files are the primary channel)."""
import json
import os
import time
from typing import Any, Dict


class MetricsLogger:
    def __init__(self, log_dir: str):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter
            self._tb = SummaryWriter(log_dir=os.path.join(log_dir, "tb"))
        except Exception:
            pass

    def log_scalars(self, step: int, scalars: Dict[str, float]) -> None:
        record = {"step": step, "time": time.time(), **scalars}
        self._jsonl.write(json.dumps(record) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)

    def log_hparams(self, hparams: Dict[str, Any]) -> None:
        path = os.path.join(self.log_dir, "hparams.json")
        existing = {}
        if os.path.exists(path):
            with open(path) as f:
                existing = json.load(f)
        existing.update({k: _jsonable(v) for k, v in hparams.items()})
        with open(path, "w") as f:
            json.dump(existing, f, indent=1)

    def close(self):
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()


def _jsonable(v):
    try:
        json.dumps(v)
        return v
    except TypeError:
        return str(v)
