"""Metric logging: rank-aware console + CSV + optional experiment trackers.

Replaces the reference's RankedLogger (src/utils/pylogger.py:7-51) and its
logger zoo (configs/logger/*.yaml: csv, tensorboard, wandb, comet, mlflow,
neptune, aim) with a small multiplexer: every log(row) goes to stdout on
process 0, to a CSV file, and to every optional tracker backend that imports
successfully (each skips gracefully when its package is absent, like the
reference's per-logger YAML selection).
"""
from __future__ import annotations

import csv
import logging
import os
import sys
from typing import Dict, Optional

import jax


def _dist_rank() -> int:
    """Process rank WITHOUT initializing the XLA backend.

    jax.process_index() would instantiate the backend — fatal when called
    (e.g. by a module-level ranked_logger) before jax.distributed.initialize
    in a multi-process launch, and it would also freeze rank 0 into every
    logger created before init. The public jax.distributed.is_initialized()
    gates the lookup; before init (or single-process) the rank is 0 by
    definition, and the fallback never touches the XLA backend."""
    try:
        if not jax.distributed.is_initialized():
            return 0
        from jax._src import distributed

        return int(distributed.global_state.process_id or 0)
    except Exception:  # pragma: no cover — jax internals moved
        return 0


class _RankFormatter(logging.Formatter):
    """Resolves the rank prefix lazily at emit time, so loggers created
    before jax.distributed.initialize still report the right rank."""

    def format(self, record):
        record.rank = _dist_rank()
        return super().format(record)


def ranked_logger(name: str = "use_tpu") -> logging.Logger:
    """Logger whose records are prefixed with the process rank and which
    drops non-rank-zero records (RankedLogger rank_zero_only behavior)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        handler.setFormatter(
            _RankFormatter("[rank %(rank)s] %(asctime)s %(levelname)s %(message)s")
        )
        handler.addFilter(lambda record: _dist_rank() == 0)
        logger.addHandler(handler)
        logger.setLevel(logging.INFO)
    return logger


class MetricLogger:
    def __init__(
        self,
        csv_path: Optional[str] = None,
        tensorboard_dir: Optional[str] = None,
        wandb_project: Optional[str] = None,
        wandb_kwargs: Optional[Dict] = None,
        comet_project: Optional[str] = None,
        mlflow_uri: Optional[str] = None,
        mlflow_experiment: Optional[str] = None,
        neptune_project: Optional[str] = None,
        aim_repo: Optional[str] = None,
    ):
        self.csv_path = csv_path
        self._csv_keys = None
        self._tb = None
        self._wandb = None
        self._comet = None
        self._mlflow = None
        self._neptune = None
        self._aim = None
        self._log = ranked_logger()
        rank0 = _dist_rank() == 0
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self._log.warning("tensorboard writer unavailable; skipping")
        if wandb_project and rank0:
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, **(wandb_kwargs or {})
                )
            except Exception:
                self._log.warning("wandb unavailable; skipping")
        # Remaining reference logger zoo (configs/logger/{comet,mlflow,
        # neptune,aim}.yaml) — rank-zero only, graceful skip on missing deps.
        if comet_project and rank0:
            try:
                import comet_ml

                self._comet = comet_ml.Experiment(project_name=comet_project)
            except Exception:
                self._log.warning("comet_ml unavailable; skipping")
        if (mlflow_uri or mlflow_experiment) and rank0:
            try:
                import mlflow

                if mlflow_uri:
                    mlflow.set_tracking_uri(mlflow_uri)
                if mlflow_experiment:
                    mlflow.set_experiment(mlflow_experiment)
                self._mlflow = mlflow
                mlflow.start_run()
            except Exception:
                self._log.warning("mlflow unavailable; skipping")
        if neptune_project and rank0:
            try:
                import neptune

                self._neptune = neptune.init_run(project=neptune_project)
            except Exception:
                self._log.warning("neptune unavailable; skipping")
        if aim_repo and rank0:
            try:
                from aim import Run as AimRun

                self._aim = AimRun(repo=aim_repo)
            except Exception:
                self._log.warning("aim unavailable; skipping")

    def log(self, row: Dict) -> None:
        msg = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in row.items()
        )
        self._log.info(msg)
        if self.csv_path:
            keys = list(row.keys())
            new = not os.path.exists(self.csv_path)
            os.makedirs(os.path.dirname(os.path.abspath(self.csv_path)), exist_ok=True)
            with open(self.csv_path, "a", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=keys)
                if new or keys != self._csv_keys:
                    writer.writeheader()  # new section when the schema changes
                writer.writerow(row)
            self._csv_keys = keys
        step = int(row.get("epoch", row.get("step", 0)))
        scalars = {k: v for k, v in row.items() if isinstance(v, (int, float))}
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(row)
        if self._comet is not None:
            self._comet.log_metrics(scalars, step=step)
        if self._mlflow is not None:
            self._mlflow.log_metrics(
                {k.replace("/", "_"): float(v) for k, v in scalars.items()},
                step=step,
            )
        if self._neptune is not None:
            for k, v in scalars.items():
                self._neptune[k].append(v, step=step)
        if self._aim is not None:
            for k, v in scalars.items():
                self._aim.track(v, name=k, step=step)

    def log_figure(self, tag: str, fig, step: int = 0) -> None:
        """Log a matplotlib figure (reference logs spectrogram figures to TB
        each val epoch, sgmse/model.py:221-255). Graceful no-op without TB."""
        if self._tb is not None:
            try:
                self._tb.add_figure(tag, fig, global_step=step)
            except Exception:
                self._log.warning("tb add_figure failed for %s", tag)
        try:  # free the figure either way
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception:
            pass

    def log_audio(self, tag: str, wav, sr: int, step: int = 0) -> None:
        """Log an audio clip to TB (sgmse/model.py:221-233 analog)."""
        if self._tb is not None:
            import numpy as np

            try:
                w = np.asarray(wav, dtype=np.float32).reshape(1, -1)
                self._tb.add_audio(tag, w, global_step=step, sample_rate=sr)
            except Exception:
                self._log.warning("tb add_audio failed for %s", tag)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
        if self._comet is not None:
            self._comet.end()
        if self._mlflow is not None:
            self._mlflow.end_run()
        if self._neptune is not None:
            self._neptune.stop()
        if self._aim is not None:
            self._aim.close()
