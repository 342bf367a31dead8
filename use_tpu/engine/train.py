"""Jitted train/eval steps (the Lightning-trainer replacement).

One pjit-compiled step per task: gradients are computed per microbatch and
*summed* across the accumulation axis — matching torch's manual_backward
accumulation semantics (reference LSGAN_module.py:97-115, trainer
accumulate_grad_batches for SGMSE) — then one optimizer step is applied.
Under a ('data', 'model') mesh the batch axis is sharded on 'data' and XLA
derives the gradient all-reduce (DDP equivalent) from the shardings.
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from use_tpu.engine.state import GANTrainState, TrainState

Batch = Dict[str, jnp.ndarray]
Metrics = Dict[str, jnp.ndarray]


def _accum_grads(loss_fn, params, batch: Batch, rng, accum: int):
    """Mean grads over the leading accumulation axis of every batch leaf.

    Lightning scales each microbatch loss by 1/accumulate_grad_batches before
    backward, so the effective gradient is the MEAN over the accumulated
    loader batches — matched here (grads summed in the scan, divided once).
    (The GAN manual-optimization loop sums raw manual_backward grads instead;
    see make_gan_train_step.)"""
    if accum <= 1:
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch, rng
        )
        return loss, aux, grads

    rngs = jax.random.split(rng, accum)

    def micro(carry, inp):
        sum_grads, sum_loss = carry
        mb, r = inp
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, mb, r)
        return (
            jax.tree.map(jnp.add, sum_grads, grads),
            sum_loss + loss,
        ), aux

    zero = jax.tree.map(jnp.zeros_like, params)
    (grads, loss_sum), auxs = jax.lax.scan(
        micro, (zero, jnp.zeros(())), (batch, rngs)
    )
    aux = jax.tree.map(lambda a: a[-1], auxs)
    grads = jax.tree.map(lambda g: g / accum, grads)
    return loss_sum / accum, aux, grads


def make_sgmse_train_step(
    model,
    tx,
    accum: int = 1,
    donate: bool = True,
) -> Callable[[TrainState, Batch, jax.Array], Tuple[TrainState, Metrics]]:
    """Score-matching train step (reference SGMSE_module.training_step:46-54).

    With accum > 1 the batch leaves carry a leading [accum, ...] axis.
    """

    def loss_fn(params, batch, rng):
        loss = model.train_loss(params, batch, rng)
        return loss, {}

    def step(state: TrainState, batch: Batch, rng: jax.Array):
        loss, _aux, grads = _accum_grads(loss_fn, state.params, batch, rng, accum)
        state = state.apply_gradients(grads, tx)
        return state, {"loss_Score": loss}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_sgmse_eval_step(model) -> Callable[[TrainState, Batch, jax.Array], Metrics]:
    def step(state: TrainState, batch: Batch, rng: jax.Array):
        loss = model.train_loss(state.params, batch, rng)
        return {"loss_Score": loss}

    return jax.jit(step)


def make_gan_eval_step(gan) -> Callable[[GANTrainState, Batch], Metrics]:
    """Validation/test step for the GAN task: G forward in eval mode (the
    pad-to-%64 path, no random crop — Lightning runs validation with
    training=False) + the full G criterion against the current D, no
    optimizer step (reference LSGAN_module.validation_step:121-128 /
    test_step:130-137). Returns every loss_* the criterion logs."""

    def step(state: GANTrainState, batch: Batch):
        b = gan.enhance(state.g.params, batch)
        loss, logs = gan.g_loss(state.d.params, b)
        out = {"loss_G": loss}
        out.update(logs)
        return out

    return jax.jit(step)


def make_gan_train_step(
    gan,
    g_tx,
    d_tx,
    accum: int = 1,
    donate: bool = True,
):
    """LSGAN manual-optimization loop as one jitted step
    (reference LSGAN_module.training_step:87-119).

    Per microbatch: G forward -> D loss on stop_gradient(fake) -> D grads;
    G loss (reconstruction + adv + feature-matching) -> G grads. Both
    optimizers apply the summed grads once; the G adversarial pass runs
    against the *updated* D, as in the reference (D_opt.step precedes the G
    phase).

    `gan` must provide:
        g_forward(g_params, batch, rng) -> batch with 'fake'
        d_loss(d_params, batch) -> loss_D
        g_loss(g_params_consumed_batch, d_params, batch) -> (loss_G, logs)
    """

    def d_loss_fn(d_params, batch):
        loss = gan.d_loss(d_params, batch)
        return loss, {}

    def g_loss_fn(g_params, d_params, batch, rng):
        batch = gan.g_forward(g_params, batch, rng)
        loss, logs = gan.g_loss(d_params, batch)
        return loss, logs

    def step(state: GANTrainState, batch: Batch, rng: jax.Array):
        # Accumulation runs as lax.scan over the microbatch axis so only ONE
        # microbatch's activations are live at a time — the Python-unrolled
        # formulation multiplied peak HBM by `accum` (the shipping LSGAN
        # recipe at accum 8 wanted 38.8 GB on a 15.75 GB v5e).
        if accum <= 1:
            rngs = jax.random.split(rng, 1)
            micros = jax.tree.map(lambda x: x[None], batch)
            n = 1
        else:
            rngs = jax.random.split(rng, accum)
            micros = batch  # leaves carry a leading [accum, ...] axis
            n = accum

        def per_micro_d(d_params, mb, r):
            mb = gan.g_forward(state.g.params, mb, r)
            mb = dict(mb)
            mb["fake"] = jax.lax.stop_gradient(mb["fake"])
            return jax.value_and_grad(lambda dp: gan.d_loss(dp, mb))(d_params)

        def per_micro_g(g_params, d_params, mb, r):
            return jax.value_and_grad(
                lambda gp: g_loss_fn(gp, d_params, mb, r), has_aux=True
            )(g_params)

        # --- D phase (fake detached)
        def d_micro(carry, inp):
            grads, loss = carry
            mb, r = inp
            ld, gd = per_micro_d(state.d.params, mb, r)
            return (jax.tree.map(jnp.add, grads, gd), loss + ld), None

        zero_d = jax.tree.map(jnp.zeros_like, state.d.params)
        (d_grads, loss_d), _ = jax.lax.scan(
            d_micro, (zero_d, jnp.zeros(())), (micros, rngs)
        )
        new_d = state.d.apply_gradients(d_grads, d_tx)

        # --- G phase against updated D
        def g_micro(carry, inp):
            grads, loss = carry
            mb, r = inp
            (lg, lgs), gg = per_micro_g(state.g.params, new_d.params, mb, r)
            return (jax.tree.map(jnp.add, grads, gg), loss + lg), lgs

        zero_g = jax.tree.map(jnp.zeros_like, state.g.params)
        (g_grads, loss_g), logs = jax.lax.scan(
            g_micro, (zero_g, jnp.zeros(())), (micros, rngs)
        )
        new_g = state.g.apply_gradients(g_grads, g_tx)

        metrics = {"loss_D": loss_d / n, "loss_G": loss_g / n}
        if logs:
            metrics.update({k: v[-1] for k, v in logs.items()})
        return GANTrainState(g=new_g, d=new_d), metrics

    return jax.jit(step, donate_argnums=(0,) if donate else ())
