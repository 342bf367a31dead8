"""Fused bias + LeakyReLU (+ gain) activation.

The reference ships this as the second custom CUDA op (reference:
src/models/components/sgmse/backbones/ncsnpp_utils/op/fused_act.py:114-124 +
fused_bias_act_kernel.cu): ``scale * leaky_relu(x + bias, slope)``.

On TPU there is nothing to hand-write: XLA fuses the add / select / multiply
into the producing matmul or convolution automatically. We keep the function
as the API-parity point (and the single place to change if a Pallas epilogue
fusion ever becomes profitable).
"""
from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp


def fused_leaky_relu(
    x: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    negative_slope: float = 0.2,
    scale: float = math.sqrt(2.0),
) -> jnp.ndarray:
    """scale * leaky_relu(x + bias). Bias broadcasts over the channel axis (-1)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jnp.where(x >= 0, x, negative_slope * x) * scale
