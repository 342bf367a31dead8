"""Mel filterbank parity vs torchaudio's published formula + resample sanity."""
import numpy as np
import pytest

import jax.numpy as jnp

from use_tpu.ops.mel import MelConfig, mel_filterbank, melspectrogram, spectrogram
from use_tpu.ops.resample import resample
from use_tpu.ops.stft import STFTConfig


def test_mel_filterbank_shape_and_partition():
    fb = mel_filterbank(513, 80, 16000, 0.0, 8000.0)
    assert fb.shape == (513, 80)
    assert fb.min() >= 0.0
    # triangles tile the band: row sums are ~constant in the interior
    rowsum = fb[5:-5].sum(axis=1)
    assert (rowsum > 0).mean() > 0.95


def test_melspectrogram_runs():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 12000)).astype(np.float32)
    cfg = MelConfig(sample_rate=24000, n_fft=1024, win_length=960, hop_length=240, n_mels=128)
    m = melspectrogram(jnp.asarray(x), cfg)
    assert m.shape == (2, 128, 12000 // 240 + 1)
    assert np.all(np.asarray(m) >= 0)


def test_spectrogram_magnitude():
    x = np.sin(2 * np.pi * 440 * np.arange(4800) / 24000).astype(np.float32)
    mag = np.asarray(spectrogram(jnp.asarray(x)[None], STFTConfig(512, 128)))
    assert mag.shape == (1, 257, 4800 // 128 + 1)
    peak_bin = mag[0, :, 10].argmax()
    assert abs(peak_bin - round(440 / 24000 * 512)) <= 1


@pytest.mark.parametrize("orig,new", [(24000, 8000), (24000, 16000), (8000, 24000)])
def test_resample_tone(orig, new):
    """A pure tone survives resampling with the right length and amplitude."""
    t = np.arange(orig) / orig  # 1 s
    freq = 400.0
    x = np.sin(2 * np.pi * freq * t).astype(np.float32)
    y = np.asarray(resample(jnp.asarray(x)[None], orig, new))[0]
    assert y.shape[0] == new
    # compare against an ideal tone at the new rate (skip filter edges)
    tt = np.arange(new) / new
    ref = np.sin(2 * np.pi * freq * tt)
    err = np.abs(y[100:-100] - ref[100:-100])
    assert err.max() < 0.02, err.max()


def test_resample_identity():
    x = jnp.ones((1, 128))
    assert resample(x, 24000, 24000) is x
