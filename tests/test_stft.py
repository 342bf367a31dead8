"""Golden parity tests: use_tpu.ops.stft vs torch.stft/istft.

The reference front-end is torch.stft(n_fft=1022, hop=160, hann, center=True)
(reference model_wrapper.py:66-122); checkpoint parity requires our STFT to
match it numerically.
"""
import numpy as np
import pytest
import torch

import jax.numpy as jnp

from use_tpu.ops import STFTConfig, istft, pad_spec, spec_back, spec_fwd, stft


def _torch_stft(x, cfg):
    w = torch.hann_window(cfg.wl, periodic=True) if cfg.window == "hann" else None
    if cfg.window == "sqrthann":
        w = torch.sqrt(torch.hann_window(cfg.wl, periodic=True))
    return torch.stft(
        torch.from_numpy(x),
        n_fft=cfg.n_fft,
        hop_length=cfg.hop_length,
        window=w,
        center=cfg.center,
        return_complex=True,
    )


@pytest.mark.parametrize(
    "cfg,length",
    [
        (STFTConfig(n_fft=1022, hop_length=160), 24000),
        (STFTConfig(n_fft=1022, hop_length=160), 81760),  # (512-1)*160: SGMSE train crop
        (STFTConfig(n_fft=510, hop_length=128), 16000),
        (STFTConfig(n_fft=512, hop_length=128, window="sqrthann"), 12345),
    ],
)
def test_stft_matches_torch(cfg, length):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, length)).astype(np.float32)

    ref = _torch_stft(x, cfg)  # [B, F, T] complex
    got = np.asarray(stft(jnp.asarray(x), cfg))  # [B, F, T, 2]

    assert got.shape == (2, cfg.freqs, ref.shape[-1], 2)
    np.testing.assert_allclose(got[..., 0], ref.real.numpy(), atol=2e-4, rtol=1e-4)
    np.testing.assert_allclose(got[..., 1], ref.imag.numpy(), atol=2e-4, rtol=1e-4)


@pytest.mark.parametrize(
    "cfg,length",
    [
        (STFTConfig(n_fft=1022, hop_length=160), 24000),
        (STFTConfig(n_fft=510, hop_length=128), 16000),
    ],
)
def test_istft_matches_torch(cfg, length):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, length)).astype(np.float32)
    spec_t = _torch_stft(x, cfg)

    w = torch.hann_window(cfg.wl, periodic=True)
    ref = torch.istft(
        spec_t, n_fft=cfg.n_fft, hop_length=cfg.hop_length, window=w,
        center=True, length=length,
    ).numpy()

    pair = np.stack([spec_t.real.numpy(), spec_t.imag.numpy()], axis=-1)
    got = np.asarray(istft(jnp.asarray(pair), cfg, length=length))
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-4)
    # and true roundtrip vs the original signal
    np.testing.assert_allclose(got, x, atol=5e-4, rtol=1e-4)


def test_spec_fwd_back_roundtrip_and_torch_semantics():
    rng = np.random.default_rng(2)
    pair = rng.standard_normal((3, 8, 7, 2)).astype(np.float32)
    pair[0, 0, 0] = 0.0  # zero bin must stay zero (no NaN)

    fwd = np.asarray(spec_fwd(jnp.asarray(pair), 0.15, 0.5))

    z = torch.complex(torch.from_numpy(pair[..., 0]), torch.from_numpy(pair[..., 1]))
    ref = (z.abs() ** 0.5) * torch.exp(1j * z.angle()) * 0.15
    np.testing.assert_allclose(fwd[..., 0], ref.real.numpy(), atol=1e-5)
    np.testing.assert_allclose(fwd[..., 1], ref.imag.numpy(), atol=1e-5)
    assert np.all(np.isfinite(fwd))

    back = np.asarray(spec_back(jnp.asarray(fwd), 0.15, 0.5))
    np.testing.assert_allclose(back, pair, atol=1e-4, rtol=1e-4)


def test_pad_spec():
    x = jnp.ones((1, 512, 100, 2))
    y = pad_spec(x)
    assert y.shape == (1, 512, 128, 2)
    assert float(y[..., 100:, :].sum()) == 0.0
    assert pad_spec(jnp.ones((1, 4, 64, 2))).shape == (1, 4, 64, 2)
