"""Parallel (Picard/ParaDiGMS-style) sampler tests.

The parallel sampler must converge to the exact sequential trajectory under
its per-position fold_in noise convention as tol -> 0, converge in fewer
sweeps than N at practical tolerances, shard its window axis over a device
mesh, and run end-to-end through ScoreModel.sample.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from use_tpu.models import BackboneRegistry  # noqa: F401 — populates registries
from use_tpu.models.sgmse import sampling
from use_tpu.models.sgmse.sdes import OUVESDE, batch_broadcast, crandn
from use_tpu.models.sgmse.score_model import ScoreModel


def _sequential_foldin(sde, score_fn, y, rng, eps=3e-2, denoise=True):
    """Sequential PC trajectory with the parallel sampler's noise convention:
    position-p noise = crandn(fold_in(rng_z, p)); prior uses position 0."""
    rng_z, _ = jax.random.split(rng)
    predictor = sampling.PredictorRegistry.get_by_name("reverse_diffusion")
    ts = np.linspace(sde.T, eps, sde.N)
    std_T = sde._std(jnp.full((y.shape[0],), sde.T, jnp.float32))
    x = y + batch_broadcast(std_T, y) * crandn(
        jax.random.fold_in(rng_z, 0), y.shape, y.dtype
    )
    for i, t in enumerate(ts):
        vec_t = jnp.full((y.shape[0],), t, jnp.float32)
        m, g = predictor(sde, score_fn, x, vec_t, y)
        if denoise and i == sde.N - 1:
            x = m
        else:
            z = crandn(jax.random.fold_in(rng_z, i + 1), y.shape, y.dtype)
            x = m + g * z
    return x


def _linear_setup(n_steps=7, batch=2):
    """Gaussian-posterior score -(x - y)/std(t)^2 — the realistic 1/sigma^2
    scaling that makes the reverse map contractive (a plain -(x-y) score is
    not, and Picard then degenerates to one step per sweep)."""
    rng = np.random.default_rng(5)
    y = jnp.asarray(rng.standard_normal((batch, 6, 5, 2)).astype(np.float32))
    sde = OUVESDE(N=n_steps)

    def score_fn(x, t):
        yt = jnp.tile(y, (x.shape[0] // batch, 1, 1, 1))
        std = batch_broadcast(sde._std(t), x)
        return -(x - yt) / (std * std + 1e-4)

    return sde, score_fn, y


def test_parallel_pc_exact_at_zero_tol():
    """tol=0 forces advance-by-one: the Picard result must equal the
    sequential recurrence with identical (fold_in) noise draws."""
    sde, score_fn, y = _linear_setup()
    key = jax.random.PRNGKey(7)
    sampler = sampling.get_parallel_pc_sampler(
        "reverse_diffusion", "none", sde, score_fn, y, tol=0.0, window=4
    )
    got, nfe = jax.jit(sampler)(key)
    want = _sequential_foldin(sde, score_fn, y, key)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5)
    assert int(nfe) == sde.N * 4  # N sweeps, W evals each


def test_parallel_pc_converges_in_fewer_sweeps():
    """At a practical tolerance the window slides more than one step per
    sweep (sweeps < N) while staying close to the exact trajectory."""
    sde, score_fn, y = _linear_setup(n_steps=16)
    key = jax.random.PRNGKey(3)
    W = 8
    sampler = sampling.get_parallel_pc_sampler(
        "reverse_diffusion", "none", sde, score_fn, y, tol=0.1, window=W
    )
    got, nfe = jax.jit(sampler)(key)
    sweeps = int(nfe) // W
    assert sweeps < sde.N, f"no parallel speedup: {sweeps} sweeps for N={sde.N}"
    want = _sequential_foldin(sde, score_fn, y, key)
    err = float(jnp.max(jnp.abs(got - want)))
    scale = float(jnp.max(jnp.abs(want))) + 1e-8
    assert err / scale < 0.05, f"relative error {err / scale:.4f}"


def test_parallel_pc_rejects_corrector():
    sde, score_fn, y = _linear_setup()
    with pytest.raises(ValueError):
        sampling.get_parallel_pc_sampler("reverse_diffusion", "langevin", sde, score_fn, y)


def test_parallel_pc_window_sharded_over_mesh():
    """The flattened window*batch axis shards over the 8-device CPU mesh —
    the multi-chip single-utterance latency path. The sharded run must be
    numerically identical to the unsharded one (a sharding/layout bug in the
    constrain path would otherwise pass unnoticed)."""
    sde, score_fn, y = _linear_setup(n_steps=10, batch=2)
    devices = np.array(jax.devices()[:8])
    mesh = Mesh(devices, ("data",))
    shard = NamedSharding(mesh, P("data"))
    constrain = lambda x: jax.lax.with_sharding_constraint(x, shard)
    sampler = sampling.get_parallel_pc_sampler(
        "reverse_diffusion", "none", sde, score_fn, y,
        tol=0.1, window=4, constrain=constrain,  # 4*2 = 8 shards
    )
    with mesh:
        got, nfe = jax.jit(sampler)(jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(got)))
    assert int(nfe) >= sde.N  # at least one eval per trajectory step

    plain = sampling.get_parallel_pc_sampler(
        "reverse_diffusion", "none", sde, score_fn, y, tol=0.1, window=4
    )
    want, nfe_plain = jax.jit(plain)(jax.random.PRNGKey(0))
    assert int(nfe) == int(nfe_plain)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
    )


def test_score_model_parallel_pc_end_to_end():
    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition="noisy", sde_input="noisy",
        n_fft=254, hop_length=64, num_frames=32,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batch = {"perturbed": jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))}
    out = model.sample(
        params, batch, jax.random.PRNGKey(2),
        sampler_type="parallel_pc", N=4, window=2, tol=0.1,
    )
    assert out["enhanced"].shape == batch["perturbed"].shape
    assert np.all(np.isfinite(np.asarray(out["enhanced"])))
