"""Train-state pytrees: params + optimizer state + EMA + step counter.

Replaces the Lightning trainer/module state (SURVEY §7: 'one jitted step,
not a Trainer'). EMA mirrors torch_ema as used by the legacy diffusion path
(reference sgmse/model.py:63,106-121) and is optional — the shipping
SGMSEModule has none.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray
    ema_params: Optional[Any] = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation, ema_decay: float = 0.0):
        return cls(
            params=params,
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
            ema_params=jax.tree.map(jnp.copy, params) if ema_decay > 0 else None,
            ema_decay=ema_decay,
        )

    def apply_gradients(self, grads, tx: optax.GradientTransformation) -> "TrainState":
        updates, new_opt_state = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if self.ema_params is not None:
            d = self.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, self.ema_params, new_params
            )
        return self.replace(
            params=new_params,
            opt_state=new_opt_state,
            step=self.step + 1,
            ema_params=new_ema,
        )


@struct.dataclass
class GANTrainState:
    """Paired generator/discriminator state (LSGAN two-optimizer loop)."""

    g: TrainState
    d: TrainState
