"""Mel spectrograms and magnitude spectrograms as MXU matmuls.

Matches torchaudio.transforms.MelSpectrogram / Spectrogram semantics
(power=1, center=True, reflect pad, hann window, HTK mel scale, no norm) as
used by the reference's mel discriminators and reconstruction losses
(reference: GAN/discriminator/hifigan_vocoder/hifigan_dicriminator.py:18-25,
loss_function/monaural_loss.py:77-96).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.ops.stft import STFTConfig, stft


def hz_to_mel(f: np.ndarray) -> np.ndarray:
    """HTK mel scale (torchaudio default)."""
    return 2595.0 * np.log10(1.0 + np.asarray(f, np.float64) / 700.0)


def mel_to_hz(m: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (np.asarray(m, np.float64) / 2595.0) - 1.0)


@functools.lru_cache(maxsize=None)
def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
) -> np.ndarray:
    """Triangular HTK filterbank [n_freqs, n_mels] (torchaudio melscale_fbanks,
    norm=None)."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs)
    m_pts = np.linspace(hz_to_mel(f_min), hz_to_mel(f_max), n_mels + 2)
    f_pts = mel_to_hz(m_pts)
    f_diff = f_pts[1:] - f_pts[:-1]  # [n_mels + 1]
    slopes = f_pts[None, :] - all_freqs[:, None]  # [n_freqs, n_mels + 2]
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    return fb.astype(np.float32)


@dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 24000
    n_fft: int = 2048
    win_length: Optional[int] = None
    hop_length: int = 240
    n_mels: int = 128
    f_min: float = 0.0
    f_max: Optional[float] = None
    power: float = 1.0

    @property
    def stft_cfg(self) -> STFTConfig:
        return STFTConfig(
            n_fft=self.n_fft, hop_length=self.hop_length, win_length=self.win_length,
            window="hann",
        )


def spectrogram(x: jnp.ndarray, cfg: STFTConfig, power: float = 1.0) -> jnp.ndarray:
    """Magnitude (power=1) or power spectrogram [..., F, T]."""
    spec = stft(x, cfg, precision=jax.lax.Precision.DEFAULT)
    mag = jnp.sqrt(jnp.sum(jnp.square(spec), axis=-1) + 1e-24)
    if power == 1.0:
        return mag
    return mag ** power


def melspectrogram(x: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """[..., L] -> mel magnitude [..., n_mels, T]."""
    mag = spectrogram(x, cfg.stft_cfg, cfg.power)  # [..., F, T]
    fb = jnp.asarray(
        mel_filterbank(
            cfg.n_fft // 2 + 1, cfg.n_mels, cfg.sample_rate, cfg.f_min, cfg.f_max
        )
    )
    return jnp.einsum("...ft,fm->...mt", mag, fb)
