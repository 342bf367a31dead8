"""Legacy sp-uhh model family (use_tpu/models/sgmse/legacy.py): EMA
semantics, enhance() APIs, discriminative loss and the stochastic
regeneration (denoiser -> score) composition. Reference behavior:
src/models/components/sgmse/model.py:25-1010.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from use_tpu.models.sgmse.legacy import (
    EMA,
    DiscriminativeModel,
    LegacyScoreModel,
    StochasticRegenerationModel,
)

TINY = dict(
    backbone="ncsnpp", n_fft=126, hop_length=32, num_frames=32,
    backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
)


def test_ema_semantics():
    """torch_ema: ema = d*ema + (1-d)*p after each step."""
    ema = EMA(decay=0.9)
    p0 = {"w": jnp.zeros((3,))}
    e = ema.init(p0)
    p1 = {"w": jnp.ones((3,))}
    e = ema.update(e, p1)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.1 * np.ones(3), atol=1e-7)
    e = ema.update(e, p1)
    np.testing.assert_allclose(np.asarray(e["w"]), 0.19 * np.ones(3), atol=1e-7)


def test_legacy_score_model_enhance_timeit():
    model = LegacyScoreModel(condition="noisy", sde_input="noisy", **TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    y = jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal(2000), jnp.float32
    )
    x_hat, nfe, rtf = model.enhance(
        params, y, jax.random.PRNGKey(1), N=3, timeit=True
    )
    assert x_hat.shape == y.shape
    assert nfe == 3
    assert rtf > 0
    assert bool(jnp.all(jnp.isfinite(x_hat)))
    # batched, no timing
    x2 = model.enhance(params, y[None], jax.random.PRNGKey(1), N=3)
    np.testing.assert_allclose(np.asarray(x2[0]), np.asarray(x_hat), atol=1e-5)


def test_discriminative_model_train_and_enhance():
    model = DiscriminativeModel(**TINY)
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batch = {
        "clean": jnp.asarray(0.1 * rng.standard_normal((1, 2000)), jnp.float32),
        "perturbed": jnp.asarray(0.1 * rng.standard_normal((1, 2000)), jnp.float32),
    }
    loss = model.train_loss(params, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss)) and float(loss) > 0
    out = model.enhance(params, batch["perturbed"])
    assert out.shape == batch["perturbed"].shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_stochastic_regeneration_model():
    from use_tpu.models.gan.generator import NCSNPPWrapper
    from use_tpu.models.sgmse.score_model import ScoreModel

    denoiser = NCSNPPWrapper(**TINY)
    score = ScoreModel(condition="both", sde_input="denoised", **TINY)
    model = StochasticRegenerationModel(denoiser=denoiser, score=score)
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(2)
    batch = {
        "clean": jnp.asarray(0.1 * rng.standard_normal((1, 2000)), jnp.float32),
        "perturbed": jnp.asarray(0.1 * rng.standard_normal((1, 2000)), jnp.float32),
    }
    loss = model.train_loss(params, batch, jax.random.PRNGKey(3))
    assert np.isfinite(float(loss))

    out = model.enhance(
        params, batch["perturbed"], jax.random.PRNGKey(4), N=3
    )
    assert out.shape == batch["perturbed"].shape
    assert bool(jnp.all(jnp.isfinite(out)))
