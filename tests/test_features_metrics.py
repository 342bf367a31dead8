"""STFTFeature front-end, metrics library, normalization zoo, graphics."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from use_tpu.ops.stft_feature import STFTFeature
from use_tpu.utils import metrics

SR = 24000


def _batch(n=2, length=4000):
    rng = np.random.default_rng(0)
    return {
        "perturbed": jnp.asarray(rng.standard_normal((n, length)), jnp.float32),
        "clean": jnp.asarray(rng.standard_normal((n, length)), jnp.float32),
        "sample_length": jnp.asarray([length, length // 2], jnp.int32),
    }


def test_stft_feature_forward_and_inverse():
    feat = STFTFeature(n_fft=256, win_length=256, hop_length=64, compression="sqrt")
    batch = _batch()
    out = feat(batch)
    assert out["perturbed_spectra"].shape[1] == 129
    assert out["clean_spectra"].shape == out["perturbed_spectra"].shape
    assert out["spectra_length"].shape == (2,)
    assert float(out["speech_mask"][1, 0, -1]) == 0.0  # shorter sample masked

    # inverse of an uncompressed roundtrip recovers the wav
    out["fake_spectra"] = out["perturbed_spectra"]
    rec = feat.inverse(out)
    wav = np.asarray(batch["perturbed"])
    got = np.asarray(rec["fake"])
    # hop-aligned region reconstructs
    n = (wav.shape[-1] // 64 - 4) * 64
    np.testing.assert_allclose(got[:, :n], wav[:, :n], atol=1e-3)


def test_stft_feature_subbands_and_magphase():
    feat = STFTFeature(n_fft=256, win_length=256, hop_length=64, split_subbands=4)
    out = feat(_batch())
    assert out["perturbed_subband_spectra"].shape[1] == 4
    feat2 = STFTFeature(n_fft=256, win_length=256, hop_length=64, use_mag_phase=True)
    out2 = feat2(_batch())
    assert "perturbed_mag" in out2 and "perturbed_phase" in out2


def test_si_sdr_properties():
    rng = np.random.default_rng(0)
    s = rng.standard_normal(8000).astype(np.float32)
    assert metrics.si_sdr(s, s * 0.5) > 60  # scale invariant
    noisy = s + 0.1 * rng.standard_normal(8000).astype(np.float32)
    v = metrics.si_sdr(s, noisy)
    assert 15 < v < 25


def test_energy_ratios_and_lsd():
    rng = np.random.default_rng(1)
    s = rng.standard_normal(8000).astype(np.float32)
    n = rng.standard_normal(8000).astype(np.float32) * 0.1
    sdr, sir, sar = metrics.energy_ratios(s + 0.5 * n, s, n)
    assert sir < 50 and np.isfinite(sar)
    assert metrics.lsd(s, s) < 1e-3


def test_evaluate_pair_skips_missing_scorers():
    rng = np.random.default_rng(2)
    clean = rng.standard_normal(24000).astype(np.float32)
    noisy = clean + 0.1 * rng.standard_normal(24000).astype(np.float32)
    out = metrics.evaluate_pair(clean, noisy, noisy)
    assert "si_sdr" in out and "lsd" in out


def test_normalization_zoo():
    from use_tpu.models.ncsnpp import normalization as nz

    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 8, 8, 4)), jnp.float32)
    y = jnp.asarray([1, 3])
    for cls, cond in [
        (nz.InstanceNorm2d, False), (nz.BatchNorm2d, False),
        (nz.VarianceNorm2d, False), (nz.InstanceNorm2dPlus, False),
        (nz.ConditionalVarianceNorm2d, True),
        (nz.ConditionalInstanceNorm2dPlus, True),
    ]:
        m = cls()
        if cond:
            p = m.init(jax.random.PRNGKey(0), x, y)
            out = m.apply(p, x, y)
        else:
            p = m.init(jax.random.PRNGKey(0), x)
            out = m.apply(p, x)
        assert out.shape == x.shape and np.isfinite(np.asarray(out)).all(), cls

    assert nz.get_normalization("InstanceNorm++") is nz.InstanceNorm2dPlus


def test_graphics_figure():
    from use_tpu.utils.graphics import visualize_example

    rng = np.random.default_rng(0)
    fig = visualize_example(
        rng.standard_normal(4000), rng.standard_normal(4000), rng.standard_normal(4000)
    )
    assert fig is not None


def test_content_criteria():
    """HiFi-GAN+ BWE content losses (reference hifigan/criteria.py:10-59):
    zero at identity, positive and finite under perturbation, and ordered
    by perturbation size."""
    import jax.numpy as jnp
    from use_tpu.models.gan.losses import content_criteria

    rng = np.random.default_rng(0)
    a = jnp.asarray(0.1 * rng.standard_normal((1, 24000)), jnp.float32)
    n = jnp.asarray(rng.standard_normal((1, 24000)), jnp.float32)

    w0, s0, m0 = content_criteria(a, a, sampling_rate=24000)
    assert float(w0) == 0.0 and float(s0) == 0.0 and float(m0) == 0.0

    small = content_criteria(a, a + 0.001 * n, sampling_rate=24000)
    big = content_criteria(a, a + 0.01 * n, sampling_rate=24000)
    for ls, lb in zip(small, big):
        assert 0.0 < float(ls) < float(lb)
        assert np.isfinite(float(lb))
