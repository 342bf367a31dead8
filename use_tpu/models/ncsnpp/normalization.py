"""Normalization zoo (legacy NCSNv1/v2 conditioning layers).

Re-implementation of the reference's normalization library (reference:
src/models/components/sgmse/backbones/ncsnpp_utils/normalization.py:21-234):
class-conditional batch/instance norms and variance norms used by the legacy
NCSN paths. The shipping NCSN++ uses plain GroupNorm (layers.group_norm);
these are kept for backbone-zoo completeness.

NHWC layout ([B, H, W, C]); class conditioning via embedding lookups.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def get_normalization(name: str, conditional: bool = False):
    """(normalization.py:21-44)."""
    table = {
        ("instancenorm++", False): InstanceNorm2dPlus,
        ("instancenorm++", True): ConditionalInstanceNorm2dPlus,
        ("instancenorm", False): InstanceNorm2d,
        ("variancenorm", False): VarianceNorm2d,
        ("variancenorm", True): ConditionalVarianceNorm2d,
        ("batchnorm", False): BatchNorm2d,
        ("groupnorm", False): GroupNorm,
    }
    key = (name.lower(), conditional)
    if key not in table:
        raise NotImplementedError(f"normalization {name} conditional={conditional}")
    return table[key]


class InstanceNorm2d(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class BatchNorm2d(nn.Module):
    """Batch-statistics norm (no running stats; batch mode only)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean = jnp.mean(x, axis=(0, 1, 2), keepdims=True)
        var = jnp.var(x, axis=(0, 1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * scale + bias


class GroupNorm(nn.Module):
    num_groups: int = 32
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps)(x)


class VarianceNorm2d(nn.Module):
    """Scale by inverse std only, no centering (normalization.py VarianceNorm)."""

    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param(
            "alpha", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (c,)
        )
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return x * jax.lax.rsqrt(var + self.eps) * alpha


class ConditionalVarianceNorm2d(nn.Module):
    num_classes: int = 10
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        embed = nn.Embed(
            self.num_classes, c,
            embedding_init=lambda k, s, d=jnp.float32: 1.0 + 0.02 * jax.random.normal(k, s, d),
        )
        alpha = embed(y)[:, None, None, :]
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return x * jax.lax.rsqrt(var + self.eps) * alpha


class InstanceNorm2dPlus(nn.Module):
    """InstanceNorm++ (normalization.py:102-135): instance norm plus a
    mean-of-means correction channel that preserves relative channel levels."""

    bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        alpha = self.param("alpha", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (c,))
        gamma = self.param("gamma", lambda k, s: 1.0 + 0.02 * jax.random.normal(k, s), (c,))
        means = jnp.mean(x, axis=(1, 2))  # [B, C]
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_norm = (means - m) * jax.lax.rsqrt(v + self.eps)  # [B, C]
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + self.eps)
        h = h + means_norm[:, None, None, :] * alpha
        out = gamma * h
        if self.bias:
            beta = self.param("beta", nn.initializers.zeros, (c,))
            out = out + beta
        return out


class ConditionalInstanceNorm2dPlus(nn.Module):
    """(normalization.py:138-178)."""

    num_classes: int = 10
    bias: bool = True
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, y):
        c = x.shape[-1]
        n_emb = 3 * c if self.bias else 2 * c
        embed = nn.Embed(
            self.num_classes, n_emb,
            embedding_init=lambda k, s, d=jnp.float32: jnp.concatenate(
                [1.0 + 0.02 * jax.random.normal(k, (s[0], 2 * c), d),
                 jnp.zeros((s[0], n_emb - 2 * c), d)], axis=-1,
            ),
        )
        emb = embed(y)
        gamma, alpha = emb[:, :c], emb[:, c : 2 * c]
        means = jnp.mean(x, axis=(1, 2))
        m = jnp.mean(means, axis=-1, keepdims=True)
        v = jnp.var(means, axis=-1, keepdims=True)
        means_norm = (means - m) * jax.lax.rsqrt(v + self.eps)
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        h = (x - mean) * jax.lax.rsqrt(var + self.eps)
        h = h + means_norm[:, None, None, :] * alpha[:, None, None, :]
        out = gamma[:, None, None, :] * h
        if self.bias:
            beta = emb[:, 2 * c :]
            out = out + beta[:, None, None, :]
        return out
