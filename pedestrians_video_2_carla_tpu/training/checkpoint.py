"""Checkpointing: monitored-best saving + resume (reference semantics:
``ModelCheckpoint(monitor='val_loss/primary', mode=min, save_top_k=1)`` at
``modeling.py:240-245``).

Checkpoints are flat ``np.savez`` pytree-leaf archives (portable, no extra
deps, loadable without the model class); the monitored-best/last layout and
``file://``/``wandb://`` scheme resolution mirror the reference.

Saves are **asynchronous** (the TPU-native pattern — the training loop must
not stall on host IO): ``maybe_save``/``save_last`` take a host snapshot
(device→host DMAs launched together via ``copy_to_host_async``, then
materialized — the snapshot must finish in the caller because the Trainer's
train step donates the state buffers) and hand the serialization + file IO
to a single-worker thread, so the next train step launches immediately. The one
worker serializes writes (last submitted wins per path), every archive is
written to a temp file and ``os.replace``d into place (a crash never leaves
a torn checkpoint), and ``wait()`` joins + re-raises write errors —
``restore`` and the Trainer's fit-end call it. ``async_save=False`` restores
fully synchronous semantics.
"""
import json
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, List, Optional

import jax
import numpy as np


def _snapshot_host(tree: Any) -> List[Any]:
    """Host-side numpy snapshot of the pytree leaves. All device→host DMAs
    are launched first (``copy_to_host_async``) so they overlap, then
    materialized. Must complete in the caller: the Trainer's train step
    donates the state buffers (``donate_argnums=(0,)``), so a background
    thread holding device arrays would race buffer invalidation."""
    leaves = jax.tree_util.tree_leaves(tree)
    for leaf in leaves:
        if hasattr(leaf, "copy_to_host_async"):
            leaf.copy_to_host_async()
    return [np.asarray(leaf) for leaf in leaves]


def _write_leaves(path: str, leaves: List[Any]) -> None:
    """Atomic archive write: temp file + rename (numpy appends ``.npz`` to
    bare string names, so write through an explicit file handle)."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **{f"leaf_{i}": np.asarray(leaf)
                       for i, leaf in enumerate(leaves)})
    os.replace(tmp, path + ".npz")


def _save_pytree(path: str, tree: Any) -> None:
    _write_leaves(path, jax.tree_util.tree_leaves(tree))


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
                 enabled: bool = True, async_save: bool = True):
        #: ``enabled=False`` on non-zero hosts (rank-zero guard; the reference
        #: relies on Lightning's rank-zero ModelCheckpoint behavior)
        self.enabled = enabled
        self.dirpath = dirpath
        self.monitor = monitor
        self.mode = mode
        self.best_value: Optional[float] = None
        self.best_path: Optional[str] = None
        # one worker = writes retire in submission order (last wins per path)
        self._executor = ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt") \
            if (enabled and async_save) else None
        self._pending: List[Any] = []
        self._error: Optional[BaseException] = None
        if enabled:
            os.makedirs(dirpath, exist_ok=True)

    def _is_better(self, value: float) -> bool:
        if self.best_value is None:
            return True
        return value < self.best_value if self.mode == "min" \
            else value > self.best_value

    def _submit(self, fn, *args) -> None:
        if self._executor is None:
            fn(*args)
            return
        # prune retired futures, but NEVER drop a failure: stash the first
        # error so wait() still re-raises it (a submit between the failure
        # and the wait must not swallow it)
        kept = []
        for f in self._pending:
            if not f.done():
                kept.append(f)
            elif f.exception() is not None and self._error is None:
                self._error = f.exception()
        self._pending = kept
        self._pending.append(self._executor.submit(fn, *args))

    def wait(self) -> None:
        """Join pending writes; re-raises the first write error (including
        errors from writes that retired before this call)."""
        pending, self._pending = self._pending, []
        for f in pending:
            err = f.exception()
            if err is not None and self._error is None:
                self._error = err
        if self._error is not None:
            err, self._error = self._error, None
            raise err

    def maybe_save(self, state, metrics: Dict[str, float], step: int,
                   _leaves: Optional[List[Any]] = None) -> bool:
        if not self.enabled:
            return False
        value = metrics.get(self.monitor)
        if value is None or not self._is_better(value):
            return False
        prev_path = self.best_path
        self.best_value = value
        self.best_path = os.path.join(self.dirpath, f"best-step{step}")
        leaves = _snapshot_host(state) if _leaves is None else _leaves

        def job(path=self.best_path, prev=prev_path, val=float(value)):
            # write the new best FIRST: a failed write must leave the
            # previous best checkpoint (and its best.json) intact on disk
            _write_leaves(path, leaves)
            meta_tmp = os.path.join(self.dirpath, "best.json.tmp")
            with open(meta_tmp, "w") as f:
                json.dump({"path": path, "step": step, self.monitor: val}, f)
            os.replace(meta_tmp, os.path.join(self.dirpath, "best.json"))
            if prev and os.path.exists(prev + ".npz"):
                os.remove(prev + ".npz")  # save_top_k=1

        self._submit(job)
        return True

    def save_last(self, state, step: int,
                  _leaves: Optional[List[Any]] = None) -> str:
        path = os.path.join(self.dirpath, "last")
        if self.enabled:
            leaves = _snapshot_host(state) if _leaves is None else _leaves
            self._submit(_write_leaves, path, leaves)
        return path

    def save(self, state, metrics: Dict[str, float], step: int) -> bool:
        """End-of-validation save: monitored-best check + 'last', sharing ONE
        host snapshot of the state (the Trainer calls both back-to-back —
        two independent snapshots would double the device→host traffic)."""
        if not self.enabled:
            return False
        leaves = _snapshot_host(state)
        saved = self.maybe_save(state, metrics, step, _leaves=leaves)
        self.save_last(state, step, _leaves=leaves)
        return saved

    def restore(self, like_state, path: Optional[str] = None):
        self.wait()  # a just-submitted save must be visible to its restore
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
