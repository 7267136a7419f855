"""Hyperparameter sweep runner consuming the reference's W&B sweep YAML
format (``configs/sweep/*.yaml``; e.g.
``carla-recorded_seq2seq-embeddings.yaml:10-14`` — method, metric
{goal, name: hp/...}, parameters with value/values/min+max+distribution).

W&B's hosted bayes service needs network access; here ``bayes`` runs a
local Tree-structured Parzen Estimator (factorized good/bad kernel-density
split, Bergstra et al. 2011 — the same family of sequential model-based
optimization W&B's service uses), ``random`` runs seeded random search and
``grid`` a cartesian product. Each trial is an in-process ``modeling.main``
run, and the objective is read from the ``hp/<metric>`` aliases the trainer
logs at fit end. Results stream to ``{logs_dir}/sweep_results.jsonl``; the
best trial is printed as JSON.
"""
import argparse
import itertools
import json
import math
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


class TPESampler:
    """Factorized Tree-structured Parzen Estimator over the sweep's tunable
    parameters: after ``n_startup`` random trials, history is split into the
    top ``gamma`` fraction (good) and the rest (bad); candidates are drawn
    from the good-trial kernel density and ranked by the good/bad density
    ratio, independently per parameter (the classic TPE factorization)."""

    N_STARTUP = 5
    N_CANDIDATES = 24
    GAMMA = 0.25

    def __init__(self, params: Dict[str, Any], sign: float, seed: int):
        self.params = params
        self.sign = sign  # +1 maximize, -1 minimize
        self.rng = random.Random(seed)

    # -- per-distribution helpers ------------------------------------
    def _tunable(self, spec: Dict[str, Any]) -> bool:
        return "value" not in spec and (
            "values" in spec or ("min" in spec and "max" in spec))

    @staticmethod
    def _to_latent(spec, v):
        if spec.get("distribution", "") in ("log_uniform",
                                            "log_uniform_values"):
            return math.log(max(float(v), 1e-300))
        return float(v)

    @staticmethod
    def _from_latent(spec, z):
        dist = spec.get("distribution", "uniform")
        if dist in ("log_uniform", "log_uniform_values"):
            v = math.exp(z)
        else:
            v = z
        lo, hi = spec["min"], spec["max"]
        v = min(max(v, lo), hi)
        return int(round(v)) if dist == "int_uniform" else v

    def _numeric_suggest(self, spec, good: List, bad: List):
        lo = self._to_latent(spec, spec["min"])
        hi = self._to_latent(spec, spec["max"])
        width = max(hi - lo, 1e-12)

        def mixture(points):
            # gaussian mixture on observed points + a uniform prior component
            sigma = width / max(2.0, math.sqrt(len(points) + 1) * 2.0)
            return points, sigma

        def density(x, points, sigma):
            p = 1.0 / width  # the uniform prior component
            for m in points:
                p += math.exp(-0.5 * ((x - m) / sigma) ** 2) \
                    / (sigma * math.sqrt(2 * math.pi))
            return p / (len(points) + 1)

        gpts, gsig = mixture([self._to_latent(spec, v) for v in good])
        bpts, bsig = mixture([self._to_latent(spec, v) for v in bad])
        best_x, best_score = None, -math.inf
        for _ in range(self.N_CANDIDATES):
            # draw from l(x): pick a good point (or the prior) and jitter
            if gpts and self.rng.random() > 1.0 / (len(gpts) + 1):
                x = self.rng.gauss(self.rng.choice(gpts), gsig)
                x = min(max(x, lo), hi)
            else:
                x = self.rng.uniform(lo, hi)
            score = density(x, gpts, gsig) / density(x, bpts, bsig)
            if score > best_score:
                best_x, best_score = x, score
        return self._from_latent(spec, best_x)

    def _categorical_suggest(self, spec, good: List, bad: List):
        choices = list(spec["values"])

        def probs(observed):
            # counts + unit prior (Laplace smoothing)
            c = [1.0 + sum(1 for v in observed if v == ch) for ch in choices]
            t = sum(c)
            return [x / t for x in c]

        gp, bp = probs(good), probs(bad)
        scores = [g / b for g, b in zip(gp, bp)]
        # sample candidates from l, keep the best ratio (TPE-style)
        best_i, best_score = None, -math.inf
        for _ in range(self.N_CANDIDATES):
            i = self.rng.choices(range(len(choices)), weights=gp)[0]
            if scores[i] > best_score:
                best_i, best_score = i, scores[i]
        return choices[best_i]

    # ----------------------------------------------------------------
    def suggest(self, history: List[Dict[str, Any]]) -> Dict[str, Any]:
        scored = [h for h in history if h.get("objective") is not None]
        if len(scored) < self.N_STARTUP:
            return {k: sample_parameter(v, self.rng)
                    for k, v in self.params.items()}
        scored.sort(key=lambda h: self.sign * h["objective"], reverse=True)
        n_good = max(1, int(math.ceil(self.GAMMA * len(scored))))
        good, bad = scored[:n_good], scored[n_good:] or scored[n_good - 1:]
        trial = {}
        for k, spec in self.params.items():
            if not self._tunable(spec):
                trial[k] = sample_parameter(spec, self.rng)
            elif "values" in spec:
                trial[k] = self._categorical_suggest(
                    spec, [h["params"][k] for h in good],
                    [h["params"][k] for h in bad])
            else:
                trial[k] = self._numeric_suggest(
                    spec, [h["params"][k] for h in good],
                    [h["params"][k] for h in bad])
        return trial


def make_sampler(config: Dict[str, Any], sign: float, seed: int):
    """-> ``suggest(history) -> trial`` for the configured method."""
    params = config.get("parameters", {})
    method = config.get("method", "random")
    if method == "grid":
        keys = list(params)
        combos = itertools.product(*(grid_parameter(params[k]) for k in keys))
        it = iter(combos)

        def grid_suggest(history):
            return dict(zip(keys, next(it)))
        return grid_suggest
    if method == "bayes":
        return TPESampler(params, sign, seed).suggest
    rng = random.Random(seed)

    def random_suggest(history):
        return {k: sample_parameter(v, rng) for k, v in params.items()}
    return random_suggest


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

    suggest = make_sampler(config, sign, cli.seed)
    best = None
    history = []
    for i in range(cli.count):
        try:
            trial = suggest(history)
        except StopIteration:  # grid exhausted before --count
            break
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
