"""Batch experiment runner (reference ``compare.py``): YAML config with
``common_params`` / ``compare_params`` / ``compare_model`` / ``common_model``,
cartesian product over variants, each run a subprocess on a thread pool with
stdout captured to ``{logs_dir}/stdout/{md5(args)}.out``."""
import argparse
import hashlib
import itertools
import os
import subprocess
import sys
from multiprocessing.pool import ThreadPool
from typing import List

import yaml


def _arg_list(variant_config: dict) -> List[str]:
    args = []
    for k, v in variant_config.items():
        if v is None:
            args.append(f"--{k}")
        elif not isinstance(v, str) and getattr(v, "__iter__", False):
            args.append(f"--{k}")
            args.extend(str(x) for x in v)
        else:
            args.append(f"--{k}={v}")
    return args


def work(variant_config: dict, logs_dir: str):
    arg_list = _arg_list(variant_config)
    arg_hash = hashlib.md5(" ".join(arg_list).encode()).hexdigest()
    with open(os.path.join(logs_dir, "stdout", f"{arg_hash}.out"), "w") as f:
        subprocess.run(
            [sys.executable, "-m", "pedestrians_video_2_carla_tpu"]
            + arg_list, stdout=f, stderr=subprocess.STDOUT)


def main(args: List[str]):
    parser = argparse.ArgumentParser(
        description="Run predefined experiment variants in parallel.")
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("-r", "--root_dir", type=str,
                        default=os.environ.get("VIDEO2CARLA_ROOT_DIR", "."))
    parser.add_argument("-n", "--num_workers", type=int, default=4)
    parsed = parser.parse_args(args)

    with open(parsed.config) as f:
        config = yaml.safe_load(f)

    logs_dir = config["common_params"].get("logs_dir", "compare_logs")
    if not os.path.isabs(logs_dir):
        logs_dir = os.path.join(parsed.root_dir, logs_dir)
    os.makedirs(os.path.join(logs_dir, "stdout"), exist_ok=True)

    pool = ThreadPool(processes=parsed.num_workers)
    for variant in variants_for(config, parsed.root_dir):
        pool.apply_async(work, (variant, logs_dir))
    pool.close()
    pool.join()


def variants_for(config: dict, root_dir: str = ".") -> List[dict]:
    """Expand a compare YAML into the cartesian product of variant configs
    (model x compare_params x per-model compare_model grids)."""
    config = {k: dict(v) if isinstance(v, dict) else v
              for k, v in config.items()}
    if "movements_model_name" in config.get("compare_params", {}):
        models = config["compare_params"].pop("movements_model_name")
    else:
        models = [config["common_params"].pop("movements_model_name", None)]
    config.setdefault("compare_model", {})
    config.setdefault("common_model", {})

    variants = []
    for model in models:
        model_variants = config["compare_model"].get(model, {})
        common = {**config["common_params"],
                  **config["common_model"].get(model, {})}
        keys = list(model_variants.keys()) \
            + list(config.get("compare_params", {}).keys())
        for combo in itertools.product(
                *model_variants.values(),
                *config.get("compare_params", {}).values()):
            variants.append(
                {**({"movements_model_name": model} if model else {}),
                 **common, **dict(zip(keys, combo)),
                 "root_dir": root_dir})
    return variants


def run():
    main(sys.argv[1:])


if __name__ == "__main__":
    run()
