"""Optimizers and schedules matching the reference's training recipes.

Reference recipes (configs/experiment/SGMSE_Large.yaml:17-28,
configs/model/LSGAN.yaml): torch.optim.Adam(lr, weight_decay) — coupled L2
(decay added to the gradient before the Adam moments) — with a per-epoch
StepLR(step_size=30, gamma=0.5), and global-norm gradient clipping.
"""
from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax


def step_lr(base_lr: float, step_size: int = 30, gamma: float = 0.5) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """torch StepLR as a function of *epoch* (stepped per epoch in the ref)."""

    def schedule(epoch):
        return base_lr * gamma ** jnp.floor(epoch / step_size)

    return schedule


def _frozen_mask(params) -> Any:
    """True for trainable leaves; the Gaussian-Fourier projection W is frozen
    (requires_grad=False in the reference, layerspp.py:35)."""

    def is_trainable(path, leaf):
        names = [p.key if hasattr(p, "key") else str(p) for p in path]
        # GFP is module m0 of an NCSN++ walk (or a *GaussianFourier* scope)
        for i, n in enumerate(names):
            if n == "W" and i > 0 and (names[i - 1] == "m0" or "Fourier" in names[i - 1]):
                return False
        return True

    return jax.tree_util.tree_map_with_path(is_trainable, params)


def adam(
    lr: float = 5e-4,
    weight_decay: float = 1e-7,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    grad_clip: Optional[float] = None,
    params_example: Any = None,
) -> optax.GradientTransformation:
    """torch-style Adam (+coupled L2, +global-norm clip), frozen-mask aware.

    The learning-rate scale is injected via `optax.inject_hyperparams` so the
    engine can write the StepLR value into the optimizer state each epoch
    (reference: per-epoch scheduler.step(), LSGAN_module.py:167-170).
    """
    chain = []
    if grad_clip is not None:
        chain.append(optax.clip_by_global_norm(grad_clip))
    if weight_decay:
        chain.append(optax.add_decayed_weights(weight_decay))
    chain.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))

    @optax.inject_hyperparams
    def scaled(learning_rate):
        return optax.chain(*chain, optax.scale(-learning_rate))

    tx = scaled(learning_rate=lr)
    if params_example is not None:
        tx = optax.masked(tx, _frozen_mask(params_example))
    return tx


def set_learning_rate(opt_state, lr):
    """Write a new learning rate into an inject_hyperparams optimizer state."""

    def update(node):
        return node

    # optax.masked wraps: MaskedState(inner_state=InjectHyperparamsState)
    inner = getattr(opt_state, "inner_state", opt_state)
    inner.hyperparams["learning_rate"] = jnp.asarray(lr)
    return opt_state


def get_learning_rate(opt_state):
    inner = getattr(opt_state, "inner_state", opt_state)
    return inner.hyperparams["learning_rate"]
