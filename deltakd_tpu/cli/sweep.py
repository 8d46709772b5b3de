"""Local hyperparameter sweep runner (wandb-free).

The reference's only sweep path is a wandb Bayesian agent driving
``exp/lrkd-deit-tiny-sweep.sh`` via env vars (reference
exp/lrkd_sweep_config.yaml, SURVEY.md §3.6). wandb isn't available on an
air-gapped TPU host, so this runner executes the *same* sweep-config format
locally: random search over the declared parameter space (uniform
distributions and value lists), N trials in-process, tracking the declared
metric. Results land in a JSONL file; the wandb path still works unmodified
on connected hosts.

    python -m deltakd_tpu.cli.sweep --config exp/lrkd_sweep_config.yaml \
        --trials 8 -- --dataset cifar-100 --data-path dataset --epochs 20
"""

from __future__ import annotations

import argparse
import json
import random
import sys
from typing import Any, Dict


def _load_yaml(path: str) -> Dict[str, Any]:
    try:
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    except ImportError:
        # minimal parser for the sweep-config subset we emit (two-space
        # indentation, scalars / lists / nested maps)
        return _mini_yaml(path)


def _mini_yaml(path: str) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    stack = [(-1, root)]
    with open(path) as f:
        for raw in f:
            line = raw.rstrip()
            if not line or line.lstrip().startswith("#"):
                continue
            indent = len(line) - len(line.lstrip())
            key, _, value = line.lstrip().partition(":")
            while stack and indent <= stack[-1][0]:
                stack.pop()
            parent = stack[-1][1]
            value = value.strip()
            if not value:
                node: Dict[str, Any] = {}
                parent[key] = node
                stack.append((indent, node))
            else:
                parent[key] = _parse_scalar(value)
    return root


def _parse_scalar(v: str) -> Any:
    if v.startswith("[") and v.endswith("]"):
        return [_parse_scalar(x.strip()) for x in v[1:-1].split(",") if x.strip()]
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    return v


def sample_params(spec: Dict[str, Any], rng: random.Random) -> Dict[str, Any]:
    out = {}
    for name, p in spec.items():
        if "values" in p:
            out[name] = rng.choice(p["values"])
        elif p.get("distribution") == "uniform":
            out[name] = rng.uniform(p["min"], p["max"])
        elif "value" in p:
            out[name] = p["value"]
        else:
            raise ValueError(f"Unsupported parameter spec for {name}: {p}")
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(description="Local sweep runner")
    parser.add_argument("--config", type=str, required=True)
    parser.add_argument("--trials", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", type=str, default="sweep_results.jsonl")
    args, passthrough = parser.parse_known_args(argv)
    if passthrough and passthrough[0] == "--":
        passthrough = passthrough[1:]

    spec = _load_yaml(args.config)
    metric_name = spec.get("metric", {}).get("name", "val_acc1")
    goal = spec.get("metric", {}).get("goal", "maximize")
    rng = random.Random(args.seed)

    from deltakd_tpu.configs import parse_args as parse_train_args
    from deltakd_tpu.train.loop import run

    best = None
    for trial in range(args.trials):
        params = sample_params(spec.get("parameters", {}), rng)
        # sweep params map to flags by replacing '_' with '-' (the reference
        # maps them through env vars in the recipe; same names either way)
        trial_argv = list(passthrough)
        for k, v in params.items():
            trial_argv += [f"--{k.replace('_', '-')}", str(v)]
        cfg = parse_train_args(trial_argv)
        cfg = cfg.replace(save_dir=f"{cfg.save_dir}/trial{trial}")
        print(f"[sweep] trial {trial}: {params}")
        metrics = run(cfg)
        score = metrics.get(metric_name, metrics.get("best_val_acc", 0.0))
        record = {"trial": trial, "params": params, "metrics": metrics,
                  metric_name: score}
        with open(args.output, "a") as f:
            f.write(json.dumps(record) + "\n")
        better = (best is None or
                  (score > best[0] if goal == "maximize" else score < best[0]))
        if better:
            best = (score, params)
        print(f"[sweep] trial {trial}: {metric_name}={score:.4f} "
              f"(best so far: {best[0]:.4f} {best[1]})")
    return best


if __name__ == "__main__":
    main()
