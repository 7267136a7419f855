"""Checkpointing: monitored-best saving + resume (reference semantics:
``ModelCheckpoint(monitor='val_loss/primary', mode=min, save_top_k=1)`` at
``modeling.py:240-245``).

Checkpoints are flat ``np.savez`` pytree-leaf archives (portable, no extra
deps, loadable without the model class); the monitored-best/last layout and
``file://``/``wandb://`` scheme resolution mirror the reference.
"""
import json
import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def _save_pytree(path: str, tree: Any) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    np.savez(path + ".npz", **{
        f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)})


def _load_pytree(path: str, like: Any) -> Any:
    # accept both the stem (what save_last/maybe_save return) and the
    # actual on-disk file name a user reads from `ls checkpoints/`
    if not path.endswith(".npz"):
        path = path + ".npz"
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    loaded = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree_util.tree_unflatten(treedef, loaded)


class CheckpointManager:
    def __init__(self, dirpath: str, monitor: str = "val_loss/primary",
                 mode: str = "min", save_top_k: int = 1,
                 enabled: bool = True):
        #: ``enabled=False`` on non-zero hosts (rank-zero guard; the reference
        #: relies on Lightning's rank-zero ModelCheckpoint behavior)
        self.enabled = enabled
        self.dirpath = dirpath
        self.monitor = monitor
        self.mode = mode
        self.best_value: Optional[float] = None
        self.best_path: Optional[str] = None
        if enabled:
            os.makedirs(dirpath, exist_ok=True)

    def _is_better(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return value < self.best_value if self.mode == "min" \
            else value > self.best_value

    def maybe_save(self, state, metrics: Dict[str, float], step: int) -> bool:
        if not self.enabled:
            return False
        value = metrics.get(self.monitor)
        if value is None or not self._is_better(value):
            return False
        if self.best_path and os.path.exists(self.best_path + ".npz"):
            os.remove(self.best_path + ".npz")
        self.best_value = value
        self.best_path = os.path.join(self.dirpath, f"best-step{step}")
        _save_pytree(self.best_path, state)
        with open(os.path.join(self.dirpath, "best.json"), "w") as f:
            json.dump({"path": self.best_path, "step": step,
                       self.monitor: float(value)}, f)
        return True

    def save_last(self, state, step: int) -> str:
        path = os.path.join(self.dirpath, "last")
        if self.enabled:
            _save_pytree(path, state)
        return path

    def restore(self, like_state, path: Optional[str] = None):
        if path is None:
            with open(os.path.join(self.dirpath, "best.json")) as f:
                path = json.load(f)["path"]
        return _load_pytree(path, like_state)


def resolve_ckpt_path(path: str, search_root: str = "outputs") -> str:
    """Resolve ``file://`` and ``wandb://`` scheme paths (reference
    ``utils/paths.py:24-32``). The reference's ``wandb://entity/project/run``
    downloads a W&B artifact; in this zero-egress environment it degrades to
    a *local* artifact lookup: the trailing run component (``run_id`` or
    ``run_id:version``) is matched against run directories under
    ``search_root`` (or ``$WANDB_ARTIFACTS_DIR``) and the newest checkpoint
    inside its ``checkpoints/`` dir is returned."""
    if path.startswith("file://"):
        return path[len("file://"):]
    if path.startswith("wandb://"):
        import glob

        run = path[len("wandb://"):].rstrip("/").split("/")[-1]
        run = run.split(":")[0]  # strip artifact version
        root = os.environ.get("WANDB_ARTIFACTS_DIR", search_root)
        hits = sorted(
            glob.glob(os.path.join(root, "**", run, "checkpoints", "*.npz"),
                      recursive=True),
            key=os.path.getmtime)
        # prefer the monitored-best checkpoint over 'last' when both exist
        best = [h for h in hits if os.path.basename(h).startswith("best")]
        if best:
            return (best[-1])[:-len(".npz")]
        if hits:
            return (hits[-1])[:-len(".npz")]
        raise FileNotFoundError(
            f"no local checkpoint for {path!r} under {root!r} "
            f"(looked for **/{run}/checkpoints/*.npz)")
    return path
