"""SGMSE stack tests: SDE closed forms + deterministic sampler parity vs the
reference, and ScoreModel end-to-end shapes/loss."""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_harness import import_reference
from use_tpu.models import BackboneRegistry  # populates registries
from use_tpu.models.sgmse import sampling
from use_tpu.models.sgmse.sdes import OUVESDE, OUVPSDE
from use_tpu.models.sgmse.score_model import ScoreModel

import_reference()
from src.models.components.sgmse.sdes import OUVESDE as TorchOUVE  # noqa: E402
from src.models.components.sgmse import sampling as torch_sampling  # noqa: E402


def test_ouve_closed_forms_match_torch():
    sde_j = OUVESDE()
    sde_t = TorchOUVE()
    t = np.linspace(0.03, 1.0, 7).astype(np.float32)
    x0 = np.random.default_rng(0).standard_normal((7, 3, 4)).astype(np.float32)
    y = np.random.default_rng(1).standard_normal((7, 3, 4)).astype(np.float32)

    std_j = np.asarray(sde_j._std(jnp.asarray(t)))
    std_t = sde_t._std(torch.from_numpy(t)).numpy()
    np.testing.assert_allclose(std_j, std_t, rtol=1e-5)

    mean_j = np.asarray(sde_j._mean(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(y)))
    mean_t = sde_t._mean(
        torch.from_numpy(x0)[..., None], torch.from_numpy(t), torch.from_numpy(y)[..., None]
    ).numpy()[..., 0]
    np.testing.assert_allclose(mean_j, mean_t, rtol=1e-5, atol=1e-6)

    dj, gj = sde_j.sde(jnp.asarray(x0), jnp.asarray(t), jnp.asarray(y))
    dt_, gt_ = sde_t.sde(torch.from_numpy(x0), torch.from_numpy(t), torch.from_numpy(y))
    np.testing.assert_allclose(np.asarray(dj), dt_.numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(gj), gt_.numpy(), rtol=1e-5)


def test_ouvp_std_monotone():
    sde = OUVPSDE(beta_min=0.01, beta_max=1.0)
    t = jnp.linspace(0.01, 1.0, 10)
    std = np.asarray(sde._std(t))
    assert np.all(np.diff(std) > 0)
    assert std[0] < 0.01


@pytest.mark.parametrize("predictor", ["reverse_diffusion", "euler_maruyama"])
def test_pc_sampler_deterministic_parity(predictor, monkeypatch):
    """With all sampling noise forced to zero, our lax.scan PC sampler must
    reproduce the reference's Python-loop sampler step-for-step on the same
    linear score function score(x,t) = -(x - y)."""
    rng = np.random.default_rng(3)
    y = rng.standard_normal((2, 6, 5, 2)).astype(np.float32)
    n_steps = 7

    # --- ours: zero noise
    monkeypatch.setattr(
        sampling, "crandn", lambda rng, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    )
    import use_tpu.models.sgmse.sdes as sdes_mod
    monkeypatch.setattr(
        sdes_mod, "crandn", lambda rng, shape, dtype=jnp.float32: jnp.zeros(shape, dtype)
    )
    sde_j = OUVESDE(N=n_steps)
    score_j = lambda x, t: -(x - jnp.asarray(y))
    sampler = sampling.get_pc_sampler(
        predictor, "none", sde_j, score_j, jnp.asarray(y), eps=3e-2
    )
    got, nfe = sampler(jax.random.PRNGKey(0))
    assert nfe == n_steps

    # --- reference: zero noise via monkeypatched randn_like
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))
    sde_t = TorchOUVE(N=n_steps)
    yt = torch.from_numpy(y)

    class ScoreFn:
        def __call__(self, x, t, *args, **kwargs):
            return -(x - yt)

    ref_sampler = torch_sampling.get_pc_sampler(
        predictor, "none", sde=sde_t, score_fn=ScoreFn(), y=yt, eps=3e-2
    )
    ref, ref_nfe = ref_sampler()
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-5)


def test_score_model_loss_and_sample_shapes():
    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition="noisy", sde_input="noisy",
        n_fft=254, hop_length=64, num_frames=32,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    batch = {
        "clean": jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32)),
        "perturbed": jnp.asarray(rng.standard_normal((2, 4000)).astype(np.float32)),
    }
    loss = jax.jit(model.train_loss)(params, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss)) and float(loss) > 0

    out = model.sample(params, batch, jax.random.PRNGKey(2), N=3)
    assert out["enhanced"].shape == batch["perturbed"].shape
    assert np.all(np.isfinite(np.asarray(out["enhanced"])))


def test_ode_sampler_runs():
    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition="noisy", sde_input="noisy",
        n_fft=254, hop_length=64, num_frames=32,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    batch = {"perturbed": jnp.asarray(rng.standard_normal((1, 4000)).astype(np.float32))}
    out = model.sample(params, batch, jax.random.PRNGKey(2), sampler_type="ode", N=2)
    assert np.all(np.isfinite(np.asarray(out["enhanced"])))


def test_sample_chunked_shapes_and_fallback():
    """sample_chunked (the batch-1 latency treatment): length preserved,
    finite output, hop-aligned chunk framing; short inputs and n_chunks<=1
    fall back to one full-clip sample; batched inputs are rejected."""
    import pytest

    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition="noisy", sde_input="noisy",
        n_fft=254, hop_length=64, num_frames=32,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    wav = jnp.asarray(rng.standard_normal((1, 9000)).astype(np.float32))

    out = model.sample_chunked(
        params, {"perturbed": wav}, jax.random.PRNGKey(2),
        n_chunks=4, overlap_frames=4, N=2,
    )
    assert out["enhanced"].shape == wav.shape
    assert np.all(np.isfinite(np.asarray(out["enhanced"])))

    # chunking degenerates to the plain path when the overlap would swallow
    # the hop (tiny input)
    short = jnp.asarray(rng.standard_normal((1, 600)).astype(np.float32))
    out = model.sample_chunked(
        params, {"perturbed": short}, jax.random.PRNGKey(2),
        n_chunks=8, overlap_frames=4, N=2,
    )
    assert out["enhanced"].shape == short.shape

    with pytest.raises(ValueError, match="single-utterance"):
        model.sample_chunked(
            params, {"perturbed": jnp.zeros((2, 4000))}, jax.random.PRNGKey(2)
        )
