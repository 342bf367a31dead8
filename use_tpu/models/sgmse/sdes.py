"""SDE library for score-based speech enhancement, in JAX.

Re-derivation of the reference's OU-based SDEs (reference:
src/models/components/sgmse/sdes.py:182-366): closed-form marginals, reverse
SDE parts and Euler discretization, expressed as pure functions over
``[B, F, T, C]`` real-pair spectrograms with per-batch time vectors ``[B]``.

Complex-noise convention: torch.randn_like on a complex tensor draws real
and imaginary parts i.i.d. N(0, 1/2) (total variance 1). ``crandn`` mirrors
that on trailing real-pair arrays — required for sampler parity.
"""
from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.models.registry import SDERegistry


def batch_broadcast(a: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Reshape per-batch scalar [B] to broadcast against x [B, ...]."""
    if a.ndim >= x.ndim:
        return a
    return a.reshape(a.shape + (1,) * (x.ndim - a.ndim))


def crandn(rng: jax.Array, shape: Tuple[int, ...], dtype=jnp.float32) -> jnp.ndarray:
    """Complex-style Gaussian on real-pair layout: each component N(0, 1/2)."""
    return jax.random.normal(rng, shape, dtype) * np.float32(1.0 / np.sqrt(2.0))


@SDERegistry.register("ouve")
@dataclass(frozen=True)
class OUVESDE:
    """Ornstein-Uhlenbeck Variance-Exploding SDE (sdes.py:182-254).

    dx = theta (y - x) dt + sigma_min (sigma_max/sigma_min)^t
         sqrt(2 log(sigma_max/sigma_min)) dw
    """

    theta: float = 1.5
    sigma_min: float = 0.05
    sigma_max: float = 0.5
    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    @property
    def logsig(self) -> float:
        return float(np.log(self.sigma_max / self.sigma_min))

    def copy(self, **kw) -> "OUVESDE":
        return replace(self, **kw)

    def sde(self, x, t, y):
        drift = self.theta * (y - x)
        sigma = self.sigma_min * (self.sigma_max / self.sigma_min) ** t
        diffusion = sigma * np.sqrt(2 * self.logsig)  # [B]
        return drift, diffusion

    def _mean(self, x0, t, y):
        exp_interp = batch_broadcast(jnp.exp(-self.theta * t), x0)
        return exp_interp * x0 + (1 - exp_interp) * y

    def _std(self, t):
        smin, theta, logsig = self.sigma_min, self.theta, self.logsig
        return jnp.sqrt(
            (smin ** 2 * jnp.exp(-2 * theta * t)
             * (jnp.exp(2 * (theta + logsig) * t) - 1) * logsig)
            / (theta + logsig)
        )

    def marginal_prob(self, x0, t, y):
        return self._mean(x0, t, y), self._std(t)

    def prior_sampling(self, rng, y):
        std = self._std(jnp.ones((y.shape[0],), y.dtype))
        return y + crandn(rng, y.shape, y.dtype) * batch_broadcast(std, y)


@SDERegistry.register("ouvp")
@dataclass(frozen=True)
class OUVPSDE:
    """Ornstein-Uhlenbeck Variance-Preserving SDE (sdes.py:282-366).

    dx = -1/2 beta(t) stiffness (y - x) dt + sqrt(beta(t)) dw,
    beta(t) = beta_min + t (beta_max - beta_min)
    """

    beta_min: float = 0.01
    beta_max: float = 1.0
    stiffness: float = 1.0
    N: int = 1000

    @property
    def T(self) -> float:
        return 1.0

    def copy(self, **kw) -> "OUVPSDE":
        return replace(self, **kw)

    def _beta(self, t):
        return self.beta_min + t * (self.beta_max - self.beta_min)

    def sde(self, x, t, y):
        drift = 0.5 * self.stiffness * batch_broadcast(self._beta(t), y) * (y - x)
        diffusion = jnp.sqrt(self._beta(t))
        return drift, diffusion

    def _mean(self, x0, t, y):
        b0, b1, s = self.beta_min, self.beta_max, self.stiffness
        fac = batch_broadcast(jnp.exp(-0.25 * s * t * (t * (b1 - b0) + 2 * b0)), x0)
        return y + fac * (x0 - y)

    def _std(self, t):
        b0, b1, s = self.beta_min, self.beta_max, self.stiffness
        return (1 - jnp.exp(-0.5 * s * t * (t * (b1 - b0) + 2 * b0))) / s

    def marginal_prob(self, x0, t, y):
        return self._mean(x0, t, y), self._std(t)

    def prior_sampling(self, rng, y):
        std = self._std(jnp.ones((y.shape[0],), y.dtype))
        return y + crandn(rng, y.shape, y.dtype) * batch_broadcast(std, y)


ScoreFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


def reverse_sde(sde, score_fn: ScoreFn, probability_flow: bool = False):
    """Reverse-time drift/diffusion and its Euler discretization.

    Functional counterpart of SDE.reverse (sdes.py:94-175); the score_fn
    closes over params and conditioning.
    """

    def rsde_sde(x, t, y):
        drift, diffusion = sde.sde(x, t, y)
        score = score_fn(x, t)
        diff_b = batch_broadcast(diffusion, x)
        score_drift = -(diff_b ** 2) * score * (0.5 if probability_flow else 1.0)
        total_drift = drift + score_drift
        out_diffusion = jnp.zeros_like(diff_b) if probability_flow else diff_b
        return total_drift, out_diffusion

    def rsde_discretize(x, t, y):
        dt = 1.0 / sde.N
        drift, diffusion = sde.sde(x, t, y)
        f = drift * dt
        g = batch_broadcast(diffusion * np.sqrt(dt), x)
        rev_f = f - g ** 2 * score_fn(x, t) * (0.5 if probability_flow else 1.0)
        rev_g = jnp.zeros_like(g) if probability_flow else g
        return rev_f, rev_g

    return rsde_sde, rsde_discretize
