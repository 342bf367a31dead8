"""Metric logging: rank-aware console + CSV + optional TensorBoard.

Replaces the reference's RankedLogger (src/utils/pylogger.py:7-51) and its
logger zoo (configs/logger/*.yaml) with a small multiplexer: every log(row)
goes to stdout on process 0, to a CSV file, to TensorBoard, and to
Weights & Biases when the optional backends import successfully.
"""
from __future__ import annotations

import csv
import logging
import os
import sys
from typing import Dict, Optional

import jax


def ranked_logger(name: str = "use_tpu") -> logging.Logger:
    """Logger whose records are prefixed with the process rank and which
    drops non-rank-zero records (RankedLogger rank_zero_only behavior)."""
    logger = logging.getLogger(name)
    if not logger.handlers:
        handler = logging.StreamHandler(sys.stdout)
        rank = jax.process_index() if jax.process_count() > 1 else 0
        handler.setFormatter(
            logging.Formatter(f"[rank {rank}] %(asctime)s %(levelname)s %(message)s")
        )
        if rank != 0:
            handler.addFilter(lambda record: False)
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
    ):
        self.csv_path = csv_path
        self._csv_keys = None
        self._tb = None
        self._wandb = None
        self._log = ranked_logger()
        if tensorboard_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(tensorboard_dir)
            except Exception:
                self._log.warning("tensorboard writer unavailable; skipping")
        if wandb_project and (jax.process_count() == 1 or jax.process_index() == 0):
            try:
                import wandb

                self._wandb = wandb.init(
                    project=wandb_project, **(wandb_kwargs or {})
                )
            except Exception:
                self._log.warning("wandb unavailable; skipping")

    def log(self, row: Dict) -> None:
        msg = " ".join(
            f"{k}={v:.5g}" if isinstance(v, float) else f"{k}={v}" for k, v in row.items()
        )
        self._log.info(msg)
        if self.csv_path:
            new = not os.path.exists(self.csv_path)
            os.makedirs(os.path.dirname(os.path.abspath(self.csv_path)), exist_ok=True)
            with open(self.csv_path, "a", newline="") as f:
                writer = csv.DictWriter(f, fieldnames=list(row.keys()))
                if new:
                    writer.writeheader()
                writer.writerow(row)
        if self._tb is not None:
            step = int(row.get("epoch", row.get("step", 0)))
            for k, v in row.items():
                if isinstance(v, (int, float)):
                    self._tb.add_scalar(k, v, step)
        if self._wandb is not None:
            self._wandb.log(row)

    def close(self):
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()
