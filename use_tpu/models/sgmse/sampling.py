"""Predictor-Corrector and probability-flow ODE samplers as lax.scan loops.

The reference runs a Python loop of N predictor/corrector steps on the GPU
(reference: src/models/components/sgmse/sampling/__init__.py:59-73,
predictors.py:40-79, correctors.py:37-111). Here the whole reverse process is
a single ``lax.scan`` over a static number of steps: one compilation, the
backbone forward inlined into the loop body, and explicit PRNG threading.

Registries keep the reference's names: predictors 'euler_maruyama' |
'reverse_diffusion' | 'none'; correctors 'langevin' | 'ald' | 'none'.
"""
from __future__ import annotations

import functools
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.models.registry import CorrectorRegistry, PredictorRegistry
from use_tpu.models.sgmse.sdes import batch_broadcast, crandn, reverse_sde

# score_fn(x, t) -> score; x [B, F, T, C], t [B]
ScoreFn = Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]


# ---------------------------------------------------------------------------
# Predictors (one reverse step; return (x_mean, gain) with
# x_next = x_mean + gain * z). Keeping the noise symbolic halves the live
# state of the scan (the sampler materializes x_next lazily at the start of
# the following step), which is what lets batch-8 10 s sampling fit in one
# v5e's HBM. `predict_x(...)` reproduces the reference's (x, x_mean) pair.
# ---------------------------------------------------------------------------

@PredictorRegistry.register("euler_maruyama")
def euler_maruyama_predictor(sde, score_fn: ScoreFn, x, t, y):
    rsde_sde, _ = reverse_sde(sde, score_fn)
    dt = -1.0 / sde.N
    f, g = rsde_sde(x, t, y)
    x_mean = x + f * dt
    gain = batch_broadcast(g, x) * np.sqrt(-dt)
    return x_mean, gain


@PredictorRegistry.register("reverse_diffusion")
def reverse_diffusion_predictor(sde, score_fn: ScoreFn, x, t, y):
    _, rsde_discretize = reverse_sde(sde, score_fn)
    f, g = rsde_discretize(x, t, y)
    return x - f, g


@PredictorRegistry.register("none")
def none_predictor(sde, score_fn: ScoreFn, x, t, y):
    return x, jnp.zeros((), x.dtype)


def predict_x(predictor, sde, score_fn: ScoreFn, x, t, y, rng):
    """Reference-style predictor step returning (x, x_mean)
    (predictors.py:40-68)."""
    x_mean, gain = predictor(sde, score_fn, x, t, y)
    z = crandn(rng, x.shape, x.dtype)
    return x_mean + gain * z, x_mean


# ---------------------------------------------------------------------------
# Correctors (n_steps inner iterations; return (x, x_mean))
# ---------------------------------------------------------------------------

@CorrectorRegistry.register("langevin")
def langevin_corrector(sde, score_fn: ScoreFn, x, t, y, rng, snr: float, n_steps: int):
    def body(i, carry):
        x, x_mean, rng = carry
        rng, sub = jax.random.split(rng)
        grad = score_fn(x, t)
        noise = crandn(sub, x.shape, x.dtype)
        grad_norm = jnp.mean(
            jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1)
        )
        noise_norm = jnp.mean(
            jnp.linalg.norm(noise.reshape(noise.shape[0], -1), axis=-1)
        )
        step_size = (snr * noise_norm / grad_norm) ** 2 * 2
        x_mean = x + step_size * grad
        x = x_mean + noise * jnp.sqrt(step_size * 2)
        return x, x_mean, rng

    x, x_mean, _ = jax.lax.fori_loop(0, n_steps, body, (x, x, rng))
    return x, x_mean


@CorrectorRegistry.register("ald")
def annealed_langevin_corrector(sde, score_fn: ScoreFn, x, t, y, rng, snr: float, n_steps: int):
    std = sde.marginal_prob(x, t, y)[1]

    def body(i, carry):
        x, x_mean, rng = carry
        rng, sub = jax.random.split(rng)
        grad = score_fn(x, t)
        noise = crandn(sub, x.shape, x.dtype)
        step_size = batch_broadcast((snr * std) ** 2 * 2, x)
        x_mean = x + step_size * grad
        x = x_mean + noise * jnp.sqrt(step_size * 2)
        return x, x_mean, rng

    x, x_mean, _ = jax.lax.fori_loop(0, n_steps, body, (x, x, rng))
    return x, x_mean


@CorrectorRegistry.register("none")
def none_corrector(sde, score_fn: ScoreFn, x, t, y, rng, snr: float, n_steps: int):
    return x, x


# ---------------------------------------------------------------------------
# PC sampler
# ---------------------------------------------------------------------------

def get_pc_sampler(
    predictor_name: str,
    corrector_name: str,
    sde,
    score_fn: ScoreFn,
    y: jnp.ndarray,
    denoise: bool = True,
    eps: float = 3e-2,
    snr: float = 0.1,
    corrector_steps: int = 1,
    probability_flow: bool = False,
    **_ignored,
):
    """Build a jit-compiled PC sampler: rng -> (sample, nfe).

    Reference parity: sampling/__init__.py:23-73 — N steps over
    linspace(T, eps, N), corrector then predictor, final denoised mean.
    """
    predictor = PredictorRegistry.get_by_name(predictor_name)
    corrector = CorrectorRegistry.get_by_name(corrector_name)
    n_corr = 0 if corrector_name == "none" else corrector_steps

    timesteps = jnp.linspace(sde.T, eps, sde.N)

    def sampler(rng: jax.Array) -> Tuple[jnp.ndarray, int]:
        # prior: y + std(T) * eps, expressed as the (x_mean, gain) carry so
        # the noise is drawn lazily inside the first step. Carrying the mean
        # and the (tiny) gain instead of both x and x_mean keeps exactly one
        # sample-sized buffer live across the scan.
        std_T = sde._std(jnp.full((y.shape[0],), sde.T, y.dtype))
        gain0 = batch_broadcast(std_T, y)

        def step(carry, t):
            x_mean, gain, rng = carry
            rng, rz, rc = jax.random.split(rng, 3)
            z = crandn(rz, x_mean.shape, x_mean.dtype)
            xt = x_mean + gain * z
            vec_t = jnp.full((y.shape[0],), t, y.dtype)
            xt, _ = corrector(sde, score_fn, xt, vec_t, y, rc, snr, n_corr)
            x_mean, gain = predictor(sde, score_fn, xt, vec_t, y)
            return (x_mean, gain, rng), None

        (x_mean, gain, rng), _ = jax.lax.scan(step, (y, gain0, rng), timesteps)
        if denoise:
            x_result = x_mean
        else:
            rng, rz = jax.random.split(rng)
            x_result = x_mean + gain * crandn(rz, x_mean.shape, x_mean.dtype)
        nfe = sde.N * (n_corr + 1)
        return x_result, nfe

    return sampler


# ---------------------------------------------------------------------------
# Parallel (Picard / ParaDiGMS-style) PC sampler
# ---------------------------------------------------------------------------

def get_parallel_pc_sampler(
    predictor_name: str,
    corrector_name: str,
    sde,
    score_fn: ScoreFn,
    y: jnp.ndarray,
    denoise: bool = True,
    eps: float = 3e-2,
    window: int = 8,
    tol: float = 0.1,
    constrain: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None,
    **_ignored,
):
    """Sliding-window Picard parallelization of the reverse-SDE trajectory.

    The sequential PC sampler (reference sampling/__init__.py:59-73) is a
    triangular recurrence x_{i+1} = m(x_i, t_i) + g(x_i, t_i) * z_{i+1}. This
    sampler instead keeps a window of W trajectory points live and performs
    Jacobi/Picard sweeps: every sweep evaluates the score network at all W
    points IN ONE BATCHED CALL (batch W*B), then slides the window past the
    leading points whose update fell below ``tol`` times the std of the
    noise injected at that step (the ParaDiGMS convergence rule,
    arXiv:2305.16317: an update smaller than the fresh per-step noise is
    statistically indistinguishable from it).
    Because the window-front point is always computed from a converged input,
    the window advances >=1 per sweep, so the sweep count is <= N and the
    result converges to the exact sequential trajectory as tol -> 0 (with the
    per-position fold_in noise convention below).

    This is the TPU-native single-utterance latency scaler the reference has
    no analog of: the W-point batch dimension shards over the device mesh
    (pass ``constrain`` = a with_sharding_constraint over the flattened
    window*batch axis), so D chips cut wall-clock per sweep by ~D while ICI
    carries only the halo of activations. On one chip it trades extra FLOPs
    (sweeps*W network evals vs N) for nothing and is not the default.

    Sampling noise is drawn per trajectory position via
    ``fold_in(rng, position)`` so noise is identical no matter which sweep
    (re)computes a point. Returns ``(sample, nfe)`` with nfe = sweeps * W
    (total network evaluations, a traced scalar).
    """
    if corrector_name != "none":
        raise ValueError(
            "parallel_pc supports corrector='none' only (the shipping "
            "SGMSE config); got %r" % corrector_name
        )
    predictor = PredictorRegistry.get_by_name(predictor_name)

    N = sde.N
    B = y.shape[0]
    rest = tuple(y.shape[1:])
    W = int(min(window, N))
    red_axes = tuple(range(1, y.ndim + 1))  # per-slot mean over [B, *rest]

    ts = jnp.linspace(sde.T, eps, N)
    ts_pad = jnp.concatenate([ts, jnp.full((W,), eps, ts.dtype)])  # [N+W]

    y_tiled = jnp.tile(y, (W,) + (1,) * (y.ndim - 1))  # [W*B, *rest]

    def sampler(rng: jax.Array) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # only the first split key is consumed, by design: the split desyncs
        # rng_z from the caller's rng stream (tests replicating the noise
        # convention — _sequential_foldin — must do the same split)
        rng_z, _ = jax.random.split(rng)

        def noise_at(p):
            return crandn(jax.random.fold_in(rng_z, p), (B,) + rest, y.dtype)

        std_T = sde._std(jnp.full((B,), sde.T, jnp.float32))
        x0 = y + batch_broadcast(std_T, y) * noise_at(jnp.zeros((), jnp.int32))
        X = jnp.broadcast_to(x0, (N + W + 1, B) + rest).astype(y.dtype)

        def cond(carry):
            _, c, _ = carry
            return c < N

        def body(carry):
            X, c, sweeps = carry
            xs = jax.lax.dynamic_slice_in_dim(X, c, W, axis=0)
            ts_w = jax.lax.dynamic_slice_in_dim(ts_pad, c, W)
            xs_flat = xs.reshape((W * B,) + rest)
            if constrain is not None:
                xs_flat = constrain(xs_flat)
            ts_flat = jnp.repeat(ts_w, B)
            m_flat, g_flat = predictor(sde, score_fn, xs_flat, ts_flat, y_tiled)
            m = m_flat.reshape((W, B) + rest)
            g = jnp.broadcast_to(g_flat, m_flat.shape).reshape((W, B) + rest)

            positions = c + 1 + jnp.arange(W)  # [W]
            zs = jax.vmap(noise_at)(positions)  # [W, B, *rest]
            if denoise:  # final transition keeps the mean (denoised) value
                nmask = jnp.where(positions == N, 0.0, 1.0)
                zs = zs * nmask.reshape((W,) + (1,) * (y.ndim))
            x_new = m + g * zs

            old = jax.lax.dynamic_slice_in_dim(X, c + 1, W, axis=0)
            err = jnp.mean(jnp.abs(x_new - old) ** 2, axis=red_axes)  # [W]
            # per-element variance of the noise injected at this transition:
            # crandn draws each real component N(0, 1/2), so the injected
            # per-component variance is g^2/2 — the acceptance threshold is
            # tol^2 x that, i.e. 'update below tol x injected-noise std'
            gsq = 0.5 * jnp.mean(jnp.abs(g) ** 2, axis=red_axes)  # [W]
            thresh = tol * tol * gsq
            # the final (position == N) transition is the denoised mean — no
            # noise is injected there, so the noise-scaled rule does not
            # apply; gate the quality-critical last step 4x tighter in std
            # (16x in variance) than the noisy steps
            thresh = jnp.where(positions == N, thresh / 16.0, thresh)
            ok = err <= thresh
            ok = ok | (positions > N)  # padding slots past the horizon
            ok = ok.at[0].set(True)  # window front is exact by induction
            adv = jnp.sum(jnp.cumprod(ok.astype(jnp.int32)))

            X = jax.lax.dynamic_update_slice_in_dim(X, x_new, c + 1, axis=0)
            return X, jnp.minimum(c + adv, N), sweeps + 1

        X, _, sweeps = jax.lax.while_loop(
            cond, body, (X, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        )
        return X[N], sweeps * W

    return sampler


# ---------------------------------------------------------------------------
# Probability-flow ODE sampler (fixed-step RK4 scan; jittable)
# ---------------------------------------------------------------------------

def get_ode_sampler(
    sde,
    score_fn: ScoreFn,
    y: jnp.ndarray,
    denoise: bool = True,
    eps: float = 3e-2,
    **_ignored,
):
    """Jittable probability-flow ODE sampler (classic RK4, N steps).

    The reference uses scipy's adaptive RK45 on the host
    (sampling/__init__.py:76-159); on TPU a fixed-step RK4 inside lax.scan
    keeps the whole trajectory on-device with static cost 4N NFE (+1 for the
    final denoising predictor step).
    """
    rsde_sde, _ = reverse_sde(sde, score_fn, probability_flow=True)

    def drift(x, t):
        vec_t = jnp.full((y.shape[0],), t, y.dtype)
        return rsde_sde(x, vec_t, y)[0]

    dt = (eps - sde.T) / sde.N  # negative
    timesteps = jnp.linspace(sde.T, eps - dt, sde.N, endpoint=False)[: sde.N]

    def sampler(rng: jax.Array) -> Tuple[jnp.ndarray, int]:
        x0 = sde.prior_sampling(rng, y)

        def step(x, t):
            k1 = drift(x, t)
            k2 = drift(x + 0.5 * dt * k1, t + 0.5 * dt)
            k3 = drift(x + 0.5 * dt * k2, t + 0.5 * dt)
            k4 = drift(x + dt * k3, t + dt)
            x = x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4)
            return x, None

        x, _ = jax.lax.scan(step, x0, timesteps)
        if denoise:  # one noiseless reverse-diffusion step at eps
            _, rsde_discretize = reverse_sde(sde, score_fn)
            vec_eps = jnp.full((y.shape[0],), eps, y.dtype)
            f, _ = rsde_discretize(x, vec_eps, y)
            x = x - f
        nfe = 4 * sde.N + (1 if denoise else 0)
        return x, nfe

    return sampler


def get_ode_sampler_adaptive(
    sde,
    score_fn: ScoreFn,
    y: jnp.ndarray,
    denoise: bool = True,
    rtol: float = 1e-5,
    atol: float = 1e-5,
    method: str = "RK45",
    eps: float = 3e-2,
    **_ignored,
):
    """Adaptive black-box ODE sampler via scipy on the host, with the drift
    jit-compiled on device — exact parity with the reference's scipy path
    (sampling/__init__.py:76-159). Not jittable end-to-end; use the RK4
    scan sampler for production."""
    from scipy import integrate

    rsde_sde, _ = reverse_sde(sde, score_fn, probability_flow=True)
    drift_jit = jax.jit(
        lambda x, t: rsde_sde(x, jnp.full((y.shape[0],), t, y.dtype), y)[0]
    )

    def sampler(rng: jax.Array) -> Tuple[jnp.ndarray, int]:
        x = sde.prior_sampling(rng, y)
        shape = x.shape

        def ode_func(t, flat):
            xt = jnp.asarray(flat.reshape(shape), jnp.float32)
            return np.asarray(drift_jit(xt, float(t)), np.float64).reshape(-1)

        solution = integrate.solve_ivp(
            ode_func, (sde.T, eps), np.asarray(x, np.float64).reshape(-1),
            rtol=rtol, atol=atol, method=method,
        )
        xs = jnp.asarray(solution.y[:, -1].reshape(shape), jnp.float32)
        nfe = int(solution.nfev)
        if denoise:
            _, rsde_discretize = reverse_sde(sde, score_fn)
            vec_eps = jnp.full((y.shape[0],), eps, y.dtype)
            f, _ = rsde_discretize(xs, vec_eps, y)
            xs = xs - f
            nfe += 1
        return xs, nfe

    return sampler
