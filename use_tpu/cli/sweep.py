"""Hyperparameter sweeps (the Hydra/Optuna multirun analog).

Reference parity: configs/hparams_search/mnist_optuna.yaml — sweep a search
space over repeated train runs and report the best trial by the optimized
metric. Random search (TPE-free) over YAML-defined spaces:

    python -m use_tpu.cli.sweep experiment=SGMSE_debug n_trials=4 \
        metric=val/loss_Score direction=min \
        'space.train.lr=loguniform(1e-5,1e-3)' \
        'space.model.t_eps=uniform(0.01,0.1)' \
        data.clean_json_path=... data.noise_json_path=...
"""
from __future__ import annotations

import json
import os
import random
import re
import sys
import time
from typing import Dict, List, Tuple

from use_tpu.utils.logging import ranked_logger

log = ranked_logger()

_SPACE_RE = re.compile(r"(loguniform|uniform|choice)\((.*)\)")


def _sample(spec: str, rng: random.Random):
    m = _SPACE_RE.match(spec.strip())
    if not m:
        raise SystemExit(f"bad space spec {spec!r}")
    kind, args = m.groups()
    vals = [a.strip() for a in args.split(",")]
    if kind == "uniform":
        lo, hi = float(vals[0]), float(vals[1])
        return rng.uniform(lo, hi)
    if kind == "loguniform":
        import math

        lo, hi = math.log(float(vals[0])), math.log(float(vals[1]))
        return math.exp(rng.uniform(lo, hi))
    return rng.choice([json_try(v) for v in vals])


def json_try(v: str):
    try:
        return json.loads(v)
    except json.JSONDecodeError:
        return v


def main(argv: List[str] = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    space: Dict[str, str] = {}
    passthrough: List[str] = []
    n_trials, metric, direction, experiment = 4, "val/loss_Score", "min", None
    for a in argv:
        if a.startswith("space."):
            k, v = a[len("space."):].split("=", 1)
            space[k] = v
        elif a.startswith("n_trials="):
            n_trials = int(a.split("=", 1)[1])
        elif a.startswith("metric="):
            metric = a.split("=", 1)[1]
        elif a.startswith("direction="):
            direction = a.split("=", 1)[1]
        elif a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        else:
            passthrough.append(a)
    if experiment is None:
        raise SystemExit("experiment=<name> required")
    if not space:
        raise SystemExit("at least one space.<key>=<spec> required")

    from use_tpu.cli.main import cmd_train

    rng = random.Random(0)
    results: List[Tuple[float, Dict]] = []
    sweep_dir = os.path.join("runs", "sweep", time.strftime("%Y%m%d-%H%M%S"))
    for trial in range(n_trials):
        sampled = {k: _sample(v, rng) for k, v in space.items()}
        overrides = passthrough + [f"{k}={v}" for k, v in sampled.items()]
        out_dir = os.path.join(sweep_dir, f"trial{trial}")
        log.info(f"trial {trial}: {sampled}")
        cmd_train(experiment, overrides, {"out_dir": out_dir})
        # read the final metric row from the CSV
        import csv

        with open(os.path.join(out_dir, "metrics.csv")) as f:
            rows = list(csv.DictReader(f))
        value = float(rows[-1][metric])
        results.append((value, sampled))
        log.info(f"trial {trial}: {metric}={value:.5g}")

    best = min(results) if direction == "min" else max(results)
    log.info(f"best {metric}={best[0]:.5g} with {best[1]}")
    with open(os.path.join(sweep_dir, "best.json"), "w") as f:
        json.dump({"metric": metric, "value": best[0], "params": best[1]}, f, indent=2)


if __name__ == "__main__":
    main()
