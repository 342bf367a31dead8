"""Training loops: the Lightning-Trainer replacement.

fit() drives epochs of jitted steps over host dataloaders with per-epoch
StepLR scheduling, validation, checkpointing and metric logging — the
functionality of trainer.fit in the reference (src/train.py:90) for both the
SGMSE single-optimizer task (SGMSE_module.py) and the LSGAN two-optimizer
task (LSGAN_module.py).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.engine import optim
from use_tpu.engine.checkpoint import CheckpointManager
from use_tpu.engine.state import GANTrainState, TrainState
from use_tpu.engine.train import (
    make_gan_train_step,
    make_sgmse_eval_step,
    make_sgmse_train_step,
)
from use_tpu.utils.logging import MetricLogger, ranked_logger

_log = ranked_logger()


class NonFiniteLossError(RuntimeError):
    """Raised when a monitored loss goes NaN/inf (the EarlyStopping
    check_finite analog, configs/callbacks/early_stopping.yaml)."""


def _check_finite(name: str, value: float) -> None:
    if not np.isfinite(value):
        raise NonFiniteLossError(f"{name} became non-finite: {value}")


def log_hyperparameters(logger: MetricLogger, cfg, params) -> None:
    """Log config + parameter counts (src/utils/logging_utils.py:11-57)."""
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    _log.info(f"model params: {n / 1e6:.2f}M")
    if logger and logger.csv_path:
        import json, os

        path = os.path.join(os.path.dirname(logger.csv_path), "hparams.json")
        with open(path, "w") as f:
            json.dump({"config": cfg, "num_params": n}, f, indent=2, default=str)


def _stack_microbatches(batch: Dict, accum: int) -> Dict:
    """[B] -> [accum, B/accum] leading axes for in-step accumulation."""
    if accum <= 1:
        return batch
    out = {}
    for k, v in batch.items():
        if hasattr(v, "shape") and getattr(v, "ndim", 0) >= 1 and v.shape[0] % accum == 0:
            out[k] = np.asarray(v).reshape(accum, v.shape[0] // accum, *v.shape[1:])
        else:
            out[k] = v
    return out


def _device_batch(batch: Dict) -> Dict:
    return {
        k: jnp.asarray(v)
        for k, v in batch.items()
        if hasattr(v, "dtype") and np.issubdtype(np.asarray(v).dtype, np.floating)
    }


@dataclass
class FitResult:
    state: Any
    history: list = field(default_factory=list)


def fit_sgmse(
    model,
    datamodule,
    lr: float = 5e-4,
    weight_decay: float = 1e-7,
    grad_clip: float = 100.0,
    accumulate_grad_batches: int = 4,
    scheduler: Dict = None,
    max_epochs: int = 1,
    max_steps_per_epoch: Optional[int] = None,
    seed: int = 0,
    ema_decay: float = 0.0,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    logger: Optional[MetricLogger] = None,
    async_ckpt: bool = False,
) -> FitResult:
    """Score-matching training (SGMSE_module semantics)."""
    scheduler = scheduler or {"step_size": 30, "gamma": 0.5}
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init_params(init_rng)
    tx = optim.adam(lr, weight_decay, grad_clip=grad_clip, params_example=params)
    state = TrainState.create(params, tx, ema_decay=ema_decay)
    accum = accumulate_grad_batches
    step_fn = make_sgmse_train_step(model, tx, accum=accum)
    eval_fn = make_sgmse_eval_step(model)
    sched = optim.step_lr(lr, **scheduler)

    mgr = (
        CheckpointManager(
            ckpt_dir, monitor="val/loss_Score", async_save=async_ckpt
        )
        if ckpt_dir else None
    )
    start_epoch = 0
    if resume and mgr and mgr.latest_step() is not None:
        state = mgr.restore(template=state)
        start_epoch = int(mgr.latest_step()) + 1  # saved at epoch N -> resume N+1

    logger = logger or MetricLogger()
    history = []
    for epoch in range(start_epoch, max_epochs):
        optim.set_learning_rate(state.opt_state, float(sched(epoch)))
        t0 = time.time()
        train_losses = []
        for i, batch in enumerate(datamodule.train_dataloader()):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            micro = _stack_microbatches(_device_batch(batch), accum)
            state, metrics = step_fn(state, micro, sub)
            loss = float(metrics["loss_Score"])
            _check_finite("train/loss_Score", loss)
            train_losses.append(loss)
        val_losses = []
        for i, batch in enumerate(datamodule.val_dataloader()):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            val_losses.append(
                float(eval_fn(state, _device_batch(batch), sub)["loss_Score"])
            )
        row = {
            "epoch": epoch,
            "train/loss_Score": float(np.mean(train_losses)) if train_losses else np.nan,
            "val/loss_Score": float(np.mean(val_losses)) if val_losses else np.nan,
            "lr": float(sched(epoch)),
            "time_s": time.time() - t0,
        }
        logger.log(row)
        history.append(row)
        if mgr:
            mgr.save(epoch, state, {"val/loss_Score": row["val/loss_Score"]})
    if mgr:
        mgr.close()
    return FitResult(state=state, history=history)


def fit_lsgan(
    gan,
    datamodule,
    g_lr: float = 5e-4,
    d_lr: float = 2e-4,
    weight_decay: float = 1e-7,
    accumulate_grad_batches: int = 8,
    scheduler: Dict = None,
    max_epochs: int = 1,
    max_steps_per_epoch: Optional[int] = None,
    seed: int = 0,
    ckpt_dir: Optional[str] = None,
    resume: bool = False,
    logger: Optional[MetricLogger] = None,
    async_ckpt: bool = False,
) -> FitResult:
    """Adversarial training (GANModule.training_step semantics)."""
    scheduler = scheduler or {"step_size": 30, "gamma": 0.5}
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    g_params, d_params = gan.init_params(init_rng)
    g_tx = optim.adam(g_lr, weight_decay, params_example=g_params)
    d_tx = optim.adam(d_lr, weight_decay, params_example=d_params)
    state = GANTrainState(
        g=TrainState.create(g_params, g_tx), d=TrainState.create(d_params, d_tx)
    )
    accum = accumulate_grad_batches
    step_fn = make_gan_train_step(gan, g_tx, d_tx, accum=accum)
    g_sched = optim.step_lr(g_lr, **scheduler)
    d_sched = optim.step_lr(d_lr, **scheduler)

    mgr = (
        CheckpointManager(ckpt_dir, monitor="val/loss_G", async_save=async_ckpt)
        if ckpt_dir else None
    )
    start_epoch = 0
    if resume and mgr and mgr.latest_step() is not None:
        state = mgr.restore(template=state)
        start_epoch = int(mgr.latest_step()) + 1  # saved at epoch N -> resume N+1

    logger = logger or MetricLogger()
    history = []
    for epoch in range(start_epoch, max_epochs):
        optim.set_learning_rate(state.g.opt_state, float(g_sched(epoch)))
        optim.set_learning_rate(state.d.opt_state, float(d_sched(epoch)))
        t0 = time.time()
        g_losses, d_losses = [], []
        for i, batch in enumerate(datamodule.train_dataloader()):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            micro = _stack_microbatches(_device_batch(batch), accum)
            state, metrics = step_fn(state, micro, sub)
            g_loss, d_loss = float(metrics["loss_G"]), float(metrics["loss_D"])
            _check_finite("train/loss_G", g_loss)
            _check_finite("train/loss_D", d_loss)
            g_losses.append(g_loss)
            d_losses.append(d_loss)
        row = {
            "epoch": epoch,
            "train/loss_G": float(np.mean(g_losses)) if g_losses else np.nan,
            "train/loss_D": float(np.mean(d_losses)) if d_losses else np.nan,
            "lr/G": float(g_sched(epoch)),
            "lr/D": float(d_sched(epoch)),
            "time_s": time.time() - t0,
        }
        logger.log(row)
        history.append(row)
        if mgr:
            mgr.save(epoch, state, {"val/loss_G": row["train/loss_G"]})
    if mgr:
        mgr.close()
    return FitResult(state=state, history=history)
