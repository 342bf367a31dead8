"""Corrector family coverage (VERDICT r4 item 2): shared-noise numerical
parity of the langevin and ald corrector updates vs the reference
(/root/reference/src/models/components/sgmse/sampling/correctors.py:37-98),
loop-count semantics, and a PC(predictor+corrector) sampler smoke through
ScoreModel so no registry entry ships without a test that runs it.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_harness import import_reference
from use_tpu.models import BackboneRegistry  # noqa: F401 — populates registries
from use_tpu.models.sgmse import sampling
from use_tpu.models.sgmse.sdes import OUVESDE
from use_tpu.models.sgmse.score_model import ScoreModel

import_reference()
from src.models.components.sgmse.sdes import OUVESDE as TorchOUVE  # noqa: E402
from src.models.components.sgmse.sampling import correctors as torch_correctors  # noqa: E402

SHAPE = (2, 6, 5)  # real tensors: the update math is dtype-agnostic and
                   # the grad/noise norms over flattened axes agree with the
                   # complex view's magnitude norms


def _shared_noise(monkeypatch, noise):
    """Force OUR crandn and the reference's randn_like to the same array."""
    monkeypatch.setattr(
        sampling, "crandn",
        lambda rng, shape, dtype=jnp.float32: jnp.asarray(noise, dtype),
    )
    monkeypatch.setattr(
        torch, "randn_like", lambda x: torch.from_numpy(noise.copy())
    )


@pytest.mark.parametrize("name", ["langevin", "ald"])
def test_corrector_single_update_parity(name, monkeypatch):
    """One corrector update with SHARED noise must match the reference's
    update_fn numerically (correctors.py:45-63 langevin, 80-98 ald)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal(SHAPE).astype(np.float32)
    y = rng.standard_normal(SHAPE).astype(np.float32)
    noise = rng.standard_normal(SHAPE).astype(np.float32)
    t = np.full((SHAPE[0],), 0.41, np.float32)
    snr = 0.5

    # a non-trivial deterministic score with per-element structure
    scale = (0.3 + 0.1 * rng.standard_normal(SHAPE)).astype(np.float32)

    _shared_noise(monkeypatch, noise)

    corrector = sampling.CorrectorRegistry.get_by_name(name)
    sde_j = OUVESDE(N=5)
    score_j = lambda xx, tt: -(xx - jnp.asarray(y)) * jnp.asarray(scale)
    got_x, got_mean = corrector(
        sde_j, score_j, jnp.asarray(x), jnp.asarray(t), jnp.asarray(y),
        jax.random.PRNGKey(0), snr, 1,
    )

    sde_t = TorchOUVE(N=5)
    yt = torch.from_numpy(y)
    st = torch.from_numpy(scale)
    score_t = lambda xx, tt, *a, **k: -(xx - yt) * st
    cls = (torch_correctors.LangevinCorrector if name == "langevin"
           else torch_correctors.AnnealedLangevinDynamics)
    ref = cls(sde_t, score_t, snr=snr, n_steps=1)
    ref_x, ref_mean = ref.update_fn(
        torch.from_numpy(x), torch.from_numpy(t), yt
    )
    np.testing.assert_allclose(np.asarray(got_x), ref_x.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_mean), ref_mean.numpy(),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("name", ["langevin", "ald"])
def test_corrector_multi_step_parity(name, monkeypatch):
    """n_steps=3 with zero noise must equal the reference's 3-iteration
    loop (checks our fori_loop carries x, not x_mean, between steps)."""
    rng = np.random.default_rng(8)
    x = rng.standard_normal(SHAPE).astype(np.float32)
    y = rng.standard_normal(SHAPE).astype(np.float32)
    t = np.full((SHAPE[0],), 0.73, np.float32)
    snr = 0.4

    _shared_noise(monkeypatch, np.zeros(SHAPE, np.float32))

    corrector = sampling.CorrectorRegistry.get_by_name(name)
    sde_j = OUVESDE(N=5)
    score_j = lambda xx, tt: -(xx - jnp.asarray(y)) * 0.7
    got_x, got_mean = corrector(
        sde_j, score_j, jnp.asarray(x), jnp.asarray(t), jnp.asarray(y),
        jax.random.PRNGKey(0), snr, 3,
    )

    sde_t = TorchOUVE(N=5)
    yt = torch.from_numpy(y)
    score_t = lambda xx, tt, *a, **k: -(xx - yt) * 0.7
    cls = (torch_correctors.LangevinCorrector if name == "langevin"
           else torch_correctors.AnnealedLangevinDynamics)
    ref = cls(sde_t, score_t, snr=snr, n_steps=3)
    ref_x, ref_mean = ref.update_fn(torch.from_numpy(x), torch.from_numpy(t), yt)
    np.testing.assert_allclose(np.asarray(got_x), ref_x.numpy(),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got_mean), ref_mean.numpy(),
                               rtol=1e-5, atol=1e-6)
    # zero-noise x == x_mean by construction
    np.testing.assert_allclose(np.asarray(got_x), np.asarray(got_mean))


def test_pc_sampler_with_corrector_parity(monkeypatch):
    """Full PC sampler (reverse_diffusion + ald), zero noise everywhere,
    vs the reference's get_pc_sampler with the same linear score — the
    corrector-in-the-loop integration the registry tests alone don't
    cover (sampling/__init__.py:23-73)."""
    rng = np.random.default_rng(9)
    y = rng.standard_normal((2, 6, 5, 2)).astype(np.float32)
    n_steps = 5

    monkeypatch.setattr(
        sampling, "crandn",
        lambda rng, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    import use_tpu.models.sgmse.sdes as sdes_mod
    monkeypatch.setattr(
        sdes_mod, "crandn",
        lambda rng, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))

    sde_j = OUVESDE(N=n_steps)
    score_j = lambda x, t: -(x - jnp.asarray(y))
    sampler = sampling.get_pc_sampler(
        "reverse_diffusion", "ald", sde_j, score_j, jnp.asarray(y),
        eps=3e-2, snr=0.5, corrector_steps=1,
    )
    got, nfe = sampler(jax.random.PRNGKey(0))
    assert nfe == n_steps * 2  # NFE = N * (corrector_steps + 1)

    from src.models.components.sgmse import sampling as torch_sampling

    sde_t = TorchOUVE(N=n_steps)
    yt = torch.from_numpy(y)

    class ScoreFn:
        def __call__(self, x, t, *args, **kwargs):
            return -(x - yt)

    ref_sampler = torch_sampling.get_pc_sampler(
        "reverse_diffusion", "ald", sde=sde_t, score_fn=ScoreFn(), y=yt,
        eps=3e-2, snr=0.5, corrector_steps=1,
    )
    ref, ref_nfe = ref_sampler()
    assert int(ref_nfe) == nfe
    np.testing.assert_allclose(np.asarray(got), ref.numpy(),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("corrector", ["langevin", "ald"])
def test_score_model_samples_with_corrector(corrector):
    """ScoreModel.sample with each corrector produces finite audio — the
    BASELINE.json config #3 path (PC + annealed Langevin), end to end."""
    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition="noisy", sde_input="noisy",
        n_fft=254, hop_length=64, num_frames=32, corrector=corrector,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    batch = {
        "perturbed": jnp.asarray(
            np.random.default_rng(0).standard_normal((1, 4000)).astype(np.float32)
        )
    }
    out = model.sample(params, batch, jax.random.PRNGKey(1), N=3,
                       corrector_steps=1, snr=0.5)
    enhanced = np.asarray(out["enhanced"])
    assert enhanced.shape == (1, 4000)
    assert np.all(np.isfinite(enhanced))
