"""Hyperparameter sweep runner consuming the reference's W&B sweep YAML
format (``configs/sweep/*.yaml``; e.g.
``carla-recorded_seq2seq-embeddings.yaml:10-14`` — method, metric
{goal, name: hp/...}, parameters with value/values/min+max+distribution).

W&B's hosted bayes service needs network access; here ``bayes``/``random``
run seeded random search and ``grid`` runs a cartesian product — each trial
is an in-process ``modeling.main`` run, and the objective is read from the
``hp/<metric>`` aliases the trainer logs at fit end. Results stream to
``{logs_dir}/sweep_results.jsonl``; the best trial is printed as JSON.
"""
import argparse
import itertools
import json
import os
import random
from typing import Any, Dict, List, Optional, Tuple

import yaml

from .modeling import main as modeling_main


def sample_parameter(spec: Dict[str, Any], rng: random.Random) -> Any:
    if "value" in spec:
        return spec["value"]
    if "values" in spec:
        return rng.choice(spec["values"])
    dist = spec.get("distribution", "uniform")
    lo, hi = spec["min"], spec["max"]
    if dist == "int_uniform":
        return rng.randint(int(lo), int(hi))
    if dist in ("log_uniform", "log_uniform_values"):
        import math
        return math.exp(rng.uniform(math.log(lo), math.log(hi)))
    return rng.uniform(lo, hi)


def grid_parameter(spec: Dict[str, Any]) -> List[Any]:
    if "value" in spec:
        return [spec["value"]]
    if "values" in spec:
        return list(spec["values"])
    raise ValueError("grid sweeps require 'value'/'values' for every "
                     f"parameter, got {spec}")


def trials_for(config: Dict[str, Any], count: int, seed: int
               ) -> List[Dict[str, Any]]:
    params = config.get("parameters", {})
    method = config.get("method", "random")
    if method == "grid":
        keys = list(params)
        combos = itertools.product(*(grid_parameter(params[k]) for k in keys))
        return [dict(zip(keys, c)) for c in itertools.islice(combos, count)]
    rng = random.Random(seed)
    return [{k: sample_parameter(v, rng) for k, v in params.items()}
            for _ in range(count)]


def trial_args(trial: Dict[str, Any], extra: List[str]) -> List[str]:
    args: List[str] = []
    for k, v in trial.items():
        if isinstance(v, (list, tuple)):
            args.append(f"--{k}")
            args.extend(str(x) for x in v)
        else:
            args.append(f"--{k}={v}")
    # literal flags from the sweep 'command' section (W&B placeholders like
    # ${args} are dropped)
    args.extend(a for a in extra if not a.startswith("${"))
    return args


def objective_from(results: Dict[str, Any], metric_name: str
                   ) -> Optional[float]:
    """``hp/PCKhn@01`` -> ``val/PCKhn@01`` in the run's val metrics."""
    key = metric_name
    if key.startswith("hp/"):
        key = "val/" + key[len("hp/"):]
    vm = results.get("val_metrics", {})
    v = vm.get(key, vm.get(metric_name))
    return float(v) if isinstance(v, (int, float)) else None


def main(argv: Optional[List[str]] = None) -> Tuple[Optional[Dict], List]:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--config", "-c", required=True)
    parser.add_argument("--count", type=int, default=10,
                        help="number of trials")
    parser.add_argument("--seed", type=int, default=22742)
    parser.add_argument("--logs_dir", default="outputs/sweeps")
    cli = parser.parse_args(argv)

    with open(cli.config) as f:
        config = yaml.safe_load(f)

    metric = config.get("metric", {"name": "hp/PCKhn@01", "goal": "maximize"})
    sign = -1.0 if metric.get("goal", "maximize") == "minimize" else 1.0
    extra = [str(a) for a in config.get("command", [])
             if isinstance(a, str) and a.startswith("--")]

    os.makedirs(cli.logs_dir, exist_ok=True)
    results_path = os.path.join(cli.logs_dir, "sweep_results.jsonl")

    best = None
    history = []
    for i, trial in enumerate(trials_for(config, cli.count, cli.seed)):
        args = trial_args(trial, extra)
        record: Dict[str, Any] = {"trial": i, "params": trial}
        try:
            results = modeling_main(args)
            value = objective_from(results, metric["name"])
            record["objective"] = value
        except Exception as e:  # a failed trial must not kill the sweep
            record["error"] = repr(e)[:200]
            value = None
        history.append(record)
        with open(results_path, "a") as f:
            f.write(json.dumps(record) + "\n")
        if value is not None and (best is None
                                  or sign * value > sign * best["objective"]):
            best = record
        print(json.dumps({"trial": i, "objective": record.get("objective"),
                          "best": best["objective"] if best else None}))

    print(json.dumps({"best": best}, default=str))
    return best, history


if __name__ == "__main__":
    main()
