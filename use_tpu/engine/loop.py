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
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.engine import optim
from use_tpu.engine.checkpoint import CheckpointManager
from use_tpu.engine.state import GANTrainState, TrainState
from use_tpu.engine.train import (
    make_gan_eval_step,
    make_gan_train_step,
    make_sgmse_eval_step,
    make_sgmse_train_step,
)
from use_tpu.parallel.mesh import default_mesh, place_batch, replicated
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


def _float_batch(batch: Dict) -> Dict[str, np.ndarray]:
    """Keep the float array leaves (what the jitted steps consume)."""
    return {
        k: np.asarray(v)
        for k, v in batch.items()
        if hasattr(v, "dtype") and np.issubdtype(np.asarray(v).dtype, np.floating)
    }


def _stack_group(group: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    """Consecutive loader batches -> one [k, B, ...] stacked array dict.

    Gradient accumulation accumulates over *successive loader batches*, like
    the reference (Lightning trainer accumulate_grad_batches for SGMSE;
    the manual batch counter in LSGAN_module.py:110-115) — NOT by splitting
    one loader batch. Batches are padded to the group's max length before
    stacking (pad_to_longest collate may differ across batches)."""
    if len(group) == 1:
        return {k: v[None] for k, v in group[0].items()}
    keys = set(group[0])
    for g in group[1:]:
        keys &= set(g)
    out = {}
    for k in keys:
        arrs = [g[k] for g in group]
        maxshape = tuple(max(a.shape[d] for a in arrs) for d in range(arrs[0].ndim))
        padded = [
            np.pad(a, [(0, m - s) for s, m in zip(a.shape, maxshape)])
            if a.shape != maxshape else a
            for a in arrs
        ]
        out[k] = np.stack(padded)
    return out


def _accum_batches(loader, accum: int, max_steps: Optional[int] = None):
    """Yield (k, stacked) microbatch groups of up to `accum` loader batches.

    The trailing partial group is flushed at epoch end (one optimizer step
    over fewer microbatches), matching Lightning's epoch-end behavior."""
    group: List[Dict[str, np.ndarray]] = []
    for i, batch in enumerate(loader):
        if max_steps is not None and i >= max_steps:
            break
        group.append(_float_batch(batch))
        if len(group) == accum:
            yield len(group), _stack_group(group)
            group = []
    if group:
        yield len(group), _stack_group(group)


def _resolve_mesh(mesh, local_batch: int, on_idle: str = "warn"):
    """mesh='auto' builds the default data-parallel mesh over all devices
    (the reference's DDP-by-default, configs/trainer/ddp.yaml); an explicit
    Mesh is used as-is; None runs single-device."""
    if mesh != "auto":
        return mesh
    global_batch = local_batch * jax.process_count()
    if len(jax.devices()) == 1:
        return None
    return default_mesh(global_batch, on_idle=on_idle)


class _StepCache:
    """Per-group-size jitted step functions (the epoch-end partial
    accumulation group recompiles once for its smaller leading axis)."""

    def __init__(self, factory: Callable[[int], Callable]):
        self._factory = factory
        self._cache: Dict[int, Callable] = {}

    def __call__(self, k: int) -> Callable:
        if k not in self._cache:
            self._cache[k] = self._factory(k)
        return self._cache[k]


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
    mesh: Any = "auto",
    rich_eval_every: Optional[int] = None,
    rich_eval_files: int = 2,
    rich_eval_N: int = 10,
    mesh_idle: str = "warn",
) -> FitResult:
    """Score-matching training (SGMSE_module semantics), data-parallel over
    the device mesh by default (reference trains DDP out of the box,
    configs/trainer/ddp.yaml:1-10): the batch axis of every microbatch is
    sharded on the mesh's 'data' axis and XLA derives the gradient
    all-reduce. Pass mesh=None for single-device, or an explicit Mesh.
    mesh_idle='error' refuses to idle more than half the slice (the CLI
    default; see parallel.mesh.default_mesh)."""
    scheduler = scheduler or {"step_size": 30, "gamma": 0.5}
    mesh = _resolve_mesh(
        mesh, getattr(datamodule, "local_batch", getattr(datamodule, "batch_size", 1)),
        on_idle=mesh_idle,
    )
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    params = model.init_params(init_rng)
    tx = optim.adam(lr, weight_decay, grad_clip=grad_clip, params_example=params)
    state = TrainState.create(params, tx, ema_decay=ema_decay)
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
    accum = accumulate_grad_batches
    steps = _StepCache(lambda k: make_sgmse_train_step(model, tx, accum=k))
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
        if mesh is not None:  # restore lands on default devices; re-replicate
            state = jax.device_put(state, replicated(mesh))
        start_epoch = int(mgr.latest_step()) + 1  # saved at epoch N -> resume N+1

    logger = logger or MetricLogger()
    history = []
    for epoch in range(start_epoch, max_epochs):
        optim.set_learning_rate(state.opt_state, float(sched(epoch)))
        t0 = time.time()
        train_losses = []
        for k, stacked in _accum_batches(
            datamodule.train_dataloader(), accum, max_steps_per_epoch
        ):
            rng, sub = jax.random.split(rng)
            if k == 1:
                dev = place_batch({kk: v[0] for kk, v in stacked.items()}, mesh)
            else:
                dev = place_batch(stacked, mesh, leading_accum=True)
            state, metrics = steps(k)(state, dev, sub)
            loss = float(metrics["loss_Score"])
            _check_finite("train/loss_Score", loss)
            train_losses.append(loss)
        val_losses = []
        for i, batch in enumerate(datamodule.val_dataloader()):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            rng, sub = jax.random.split(rng)
            dev = place_batch(_float_batch(batch), mesh)
            val_losses.append(float(eval_fn(state, dev, sub)["loss_Score"]))
        row = {
            "epoch": epoch,
            "train/loss_Score": float(np.mean(train_losses)) if train_losses else np.nan,
            "val/loss_Score": float(np.mean(val_losses)) if val_losses else np.nan,
            "lr": float(sched(epoch)),
            "time_s": time.time() - t0,
        }
        # rich metric harness every K epochs (the reference computes
        # PESQ/SI-SDR/ESTOI + TB audio/figures per val epoch —
        # sgmse/model.py:193-257, util/inference.py:23-101; here opt-in
        # because the full reverse-SDE per utterance dominates epoch time)
        if rich_eval_every and (epoch + 1) % rich_eval_every == 0:
            from use_tpu.engine.evaluate import evaluate_model

            pairs = []
            for batch in datamodule.val_dataloader():
                fb = _float_batch(batch)
                for i in range(len(fb["clean"])):
                    pairs.append({"clean": fb["clean"][i],
                                  "perturbed": fb["perturbed"][i]})
                    if len(pairs) >= rich_eval_files:
                        break
                if len(pairs) >= rich_eval_files:
                    break

            def enhance_fn(noisy, sub):
                out = model.sample(
                    state.params, {"perturbed": noisy[None]}, sub,
                    N=rich_eval_N,
                )
                return np.asarray(out["enhanced"])[0]

            rng, sub = jax.random.split(rng)
            rich = evaluate_model(enhance_fn, pairs, sub)
            logger.log({"epoch": epoch,
                        **{f"val/{k}": v for k, v in rich["metrics"].items()}})
            for i, fig in enumerate(rich["figures"]):
                logger.log_figure(f"val/example_{i}", fig, step=epoch)
            for i, clips in enumerate(rich["audio"]):
                for nm, w in clips.items():
                    logger.log_audio(f"val/{nm}_{i}", w, 24000, step=epoch)
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
    mesh: Any = "auto",
    mesh_idle: str = "warn",
) -> FitResult:
    """Adversarial training (GANModule.training_step semantics), data-parallel
    over the device mesh by default (see fit_sgmse). Runs a validation pass
    each epoch — G forward + full G criterion, no optimizer step — matching
    reference LSGAN_module.validation_step:121-128, and checkpoints on the
    true val/loss_G."""
    scheduler = scheduler or {"step_size": 30, "gamma": 0.5}
    mesh = _resolve_mesh(
        mesh, getattr(datamodule, "local_batch", getattr(datamodule, "batch_size", 1)),
        on_idle=mesh_idle,
    )
    rng = jax.random.PRNGKey(seed)
    rng, init_rng = jax.random.split(rng)
    g_params, d_params = gan.init_params(init_rng)
    g_tx = optim.adam(g_lr, weight_decay, params_example=g_params)
    d_tx = optim.adam(d_lr, weight_decay, params_example=d_params)
    state = GANTrainState(
        g=TrainState.create(g_params, g_tx), d=TrainState.create(d_params, d_tx)
    )
    if mesh is not None:
        state = jax.device_put(state, replicated(mesh))
    accum = accumulate_grad_batches
    steps = _StepCache(lambda k: make_gan_train_step(gan, g_tx, d_tx, accum=k))
    eval_fn = make_gan_eval_step(gan)
    g_sched = optim.step_lr(g_lr, **scheduler)
    d_sched = optim.step_lr(d_lr, **scheduler)

    mgr = (
        CheckpointManager(ckpt_dir, monitor="val/loss_G", async_save=async_ckpt)
        if ckpt_dir else None
    )
    start_epoch = 0
    if resume and mgr and mgr.latest_step() is not None:
        state = mgr.restore(template=state)
        if mesh is not None:  # restore lands on default devices; re-replicate
            state = jax.device_put(state, replicated(mesh))
        start_epoch = int(mgr.latest_step()) + 1  # saved at epoch N -> resume N+1

    logger = logger or MetricLogger()
    history = []
    for epoch in range(start_epoch, max_epochs):
        optim.set_learning_rate(state.g.opt_state, float(g_sched(epoch)))
        optim.set_learning_rate(state.d.opt_state, float(d_sched(epoch)))
        t0 = time.time()
        g_losses, d_losses = [], []
        for k, stacked in _accum_batches(
            datamodule.train_dataloader(), accum, max_steps_per_epoch
        ):
            rng, sub = jax.random.split(rng)
            if k == 1:
                dev = place_batch({kk: v[0] for kk, v in stacked.items()}, mesh)
            else:
                dev = place_batch(stacked, mesh, leading_accum=True)
            state, metrics = steps(k)(state, dev, sub)
            g_loss, d_loss = float(metrics["loss_G"]), float(metrics["loss_D"])
            _check_finite("train/loss_G", g_loss)
            _check_finite("train/loss_D", d_loss)
            g_losses.append(g_loss)
            d_losses.append(d_loss)
        # validation: G forward + full criterion against the current D
        # (LSGAN_module.validation_step:121-128; logged with sync_dist there —
        # here the mesh makes the loss globally consistent by construction)
        val_rows = []
        for i, batch in enumerate(datamodule.val_dataloader()):
            if max_steps_per_epoch and i >= max_steps_per_epoch:
                break
            dev = place_batch(_float_batch(batch), mesh)
            val_rows.append(
                {k2: float(v) for k2, v in eval_fn(state, dev).items()}
            )
        val_means = {
            f"val/{k2}": float(np.mean([r[k2] for r in val_rows]))
            for k2 in (val_rows[0] if val_rows else {})
        }
        row = {
            "epoch": epoch,
            "train/loss_G": float(np.mean(g_losses)) if g_losses else np.nan,
            "train/loss_D": float(np.mean(d_losses)) if d_losses else np.nan,
            **val_means,
            "lr/G": float(g_sched(epoch)),
            "lr/D": float(d_sched(epoch)),
            "time_s": time.time() - t0,
        }
        logger.log(row)
        history.append(row)
        if mgr:
            mgr.save(
                epoch, state,
                {"val/loss_G": row.get("val/loss_G", row["train/loss_G"])},
            )
    if mgr:
        mgr.close()
    return FitResult(state=state, history=history)
