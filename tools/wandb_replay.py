#!/usr/bin/env python
"""Replay a WandbOfflineLogger run directory into a real W&B run.

The reference uses ``WandbLogger`` as its primary logger
(reference ``modeling.py:194-224``); in this zero-egress environment
``--logger wandb`` writes the W&B run-dir *file* layout
(config.yaml / wandb-metadata.json / wandb-summary.json /
wandb-history.jsonl) but cannot produce the binary ``.wandb``
transaction log that ``wandb sync`` consumes — that requires the wandb
package. This script closes the gap wherever wandb IS installed: point
it at one (or many) ``offline-run-*/files`` dirs and it calls
``wandb.init()`` + ``wandb.log(row)`` per history line, producing a
fully syncable/synced run.

Usage:
    python tools/wandb_replay.py LOGDIR [LOGDIR ...] \
        [--entity E] [--project P] [--mode offline|online] [--dry-run]

LOGDIR may be the training ``logs`` dir (the ``wandb/offline-run-*``
subdirs are discovered), an ``offline-run-*`` dir, or its ``files``
subdir. ``--dry-run`` parses and validates the files without importing
wandb (used by the unit test).
"""
import argparse
import glob
import json
import os
import sys


def discover_run_dirs(path):
    """Yield every `files` dir reachable from `path`."""
    if os.path.basename(path) == "files" and os.path.isdir(path):
        return [path]
    direct = os.path.join(path, "files")
    if os.path.isdir(direct):
        return [direct]
    found = sorted(glob.glob(os.path.join(path, "wandb",
                                          "offline-run-*", "files")))
    if not found:
        found = sorted(glob.glob(os.path.join(path, "offline-run-*",
                                              "files")))
    return found


def load_run(files_dir):
    """Parse one run dir -> (metadata, config, history_rows, summary).

    Raises ValueError on malformed content so callers can report which
    run failed instead of crashing mid-replay.
    """
    def _read_json(name, default):
        p = os.path.join(files_dir, name)
        if not os.path.exists(p):
            return default
        with open(p) as f:
            return json.load(f)

    meta = _read_json("wandb-metadata.json", {})
    summary = _read_json("wandb-summary.json", {})

    config = {}
    cfg_path = os.path.join(files_dir, "config.yaml")
    if os.path.exists(cfg_path):
        import yaml
        with open(cfg_path) as f:
            raw = yaml.safe_load(f) or {}
        for k, v in raw.items():
            # wandb config format: {key: {value: ...}}
            config[k] = v.get("value") if isinstance(v, dict) and \
                "value" in v else v

    history = []
    hist_path = os.path.join(files_dir, "wandb-history.jsonl")
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            for lineno, line in enumerate(f, 1):
                line = line.strip()
                if not line:
                    continue
                try:
                    row = json.loads(line)
                except json.JSONDecodeError as e:
                    raise ValueError(
                        f"{hist_path}:{lineno}: bad history row: {e}")
                if "_step" not in row:
                    raise ValueError(
                        f"{hist_path}:{lineno}: history row missing _step")
                history.append(row)
    return meta, config, history, summary


def replay_run(files_dir, entity=None, project=None, mode="offline",
               dry_run=False, out=sys.stdout):
    meta, config, history, summary = load_run(files_dir)
    entity = entity or meta.get("entity")
    project = project or meta.get("project", "pv2c")
    run_id = meta.get("run_id")
    print(f"[{files_dir}] {len(history)} history rows, "
          f"{len(config)} config keys -> "
          f"{entity or '<default-entity>'}/{project}", file=out)
    if dry_run:
        return {"rows": len(history), "config_keys": len(config),
                "summary_keys": len(summary)}

    import wandb  # deferred: absent in the training environment
    run = wandb.init(entity=entity, project=project, name=run_id,
                     config=config, mode=mode,
                     settings=wandb.Settings(start_method="thread"))
    try:
        for row in history:
            step = int(row.pop("_step"))
            row.pop("_timestamp", None)
            run.log(row, step=step)
        for k, v in summary.items():
            if not k.startswith("_"):
                run.summary[k] = v
    finally:
        run.finish()
    return {"rows": len(history), "config_keys": len(config),
            "summary_keys": len(summary)}


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("logdirs", nargs="+")
    p.add_argument("--entity", default=None)
    p.add_argument("--project", default=None)
    p.add_argument("--mode", default="offline",
                   choices=["offline", "online"])
    p.add_argument("--dry-run", action="store_true",
                   help="validate files without importing wandb")
    args = p.parse_args(argv)

    run_dirs = []
    for d in args.logdirs:
        run_dirs.extend(discover_run_dirs(d))
    if not run_dirs:
        p.error(f"no offline-run dirs found under {args.logdirs}")
    for files_dir in run_dirs:
        replay_run(files_dir, entity=args.entity, project=args.project,
                   mode=args.mode, dry_run=args.dry_run)
    return 0


if __name__ == "__main__":
    sys.exit(main())
