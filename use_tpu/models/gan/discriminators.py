"""HiFi-GAN-style discriminator banks in Flax (channels-last).

Re-implementation of the reference's composite discriminator
`hifigan_vocoder_discriminator_24k_MVD` and its building blocks (reference:
GAN/discriminator/hifigan_vocoder/hifigan_dicriminator.py:11-254,
GAN/discriminator/hifigan_vocoder/hifigan.py:200-303,
GAN/discriminator/hifigan/open_models.py:282-331):

- MultiPeriodDiscriminator (periods 2/3/5/7/11, strided 2-D convs over the
  period-folded waveform)
- MultiWaveDiscriminator (grouped 1-D conv stacks at 8/12/16/24 kHz via
  polyphase resampling)
- MultiMelSpecDiscriminator (2-D convs + InstanceNorm + GLU over log-mel)

Layouts: waveforms [B, T]; 1-D features [B, T, C]; 2-D features
[B, H, W, C]. Logits/features are returned as nested lists
[bank][disc] -> (logits, [feature maps]), feeding the batch-dict keys
`predicted_{key}_logits` / `predicted_{key}_feature_list`.

Note: torch weight_norm on the period convs is a reparametrization only; we
train plain kernels (fold g*v/||v|| at checkpoint conversion).
"""
from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from use_tpu.models.registry import DiscriminatorRegistry
from use_tpu.ops.mel import MelConfig, melspectrogram
from use_tpu.ops.resample import resample

SAMPLE_RATE = 24000

LRELU_SLOPE = 0.1


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=LRELU_SLOPE)


class PeriodDiscriminator(nn.Module):
    """hifigan.py:200-267. Input [B, T] waveform."""

    period: int = 3
    kernel_sizes: Tuple[int, int] = (5, 3)
    channels: int = 32
    downsample_scales: Tuple[int, ...] = (3, 3, 3, 3, 1)
    max_downsample_channels: int = 1024

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        b, t = x.shape
        if t % self.period != 0:
            n_pad = self.period - (t % self.period)
            x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
            t = t + n_pad
        # [B, T/p, p, 1]: fold the waveform; convs stride over time only
        h = x.reshape(b, t // self.period, self.period, 1)

        fmap = []
        out_chs = self.channels
        k0 = self.kernel_sizes[0]
        for i, scale in enumerate(self.downsample_scales):
            h = nn.Conv(
                out_chs, (k0, 1), strides=(scale, 1),
                padding=(((k0 - 1) // 2, (k0 - 1) // 2), (0, 0)),
                name=f"conv{i}",
            )(h)
            h = _lrelu(h)
            fmap.append(h)
            out_chs = min(out_chs * 4, self.max_downsample_channels)
        k1 = self.kernel_sizes[1]
        h = nn.Conv(
            1, (k1 - 1, 1), strides=(1, 1),
            padding=(((k1 - 1) // 2, (k1 - 1) // 2), (0, 0)),
            name="conv_post",
        )(h)
        fmap.append(h)
        logits = h.reshape(b, -1)
        return logits, fmap


class MultiPeriodDiscriminator(nn.Module):
    periods: Tuple[int, ...] = (2, 3, 5, 7, 11)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        logits, fmaps = [], []
        for p in self.periods:
            lg, fm = PeriodDiscriminator(period=p, name=f"period{p}")(x)
            logits.append(lg)
            fmaps.append(fm)
        return logits, fmaps


class WaveDiscriminator(nn.Module):
    """Grouped 1-D conv stack at a target sample rate (open_models.py:282-331)."""

    sample_rate: int = 24000

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        if self.sample_rate != SAMPLE_RATE:
            x = resample(x, SAMPLE_RATE, self.sample_rate)
        h = x[..., None]  # [B, T, 1]
        kernel_sizes = (15, 41, 41, 41, 41, 5, 3)
        strides = (1, 4, 4, 4, 4, 1, 1)
        channels = (16, 64, 256, 1024, 1024, 1024)
        groups = (1, 4, 16, 64, 256, 1, 1)
        chans = channels + (channels[-1],)
        # Minimum input so every VALID conv yields >=1 frame. Shorter clips
        # (possible at low rates: 8 kHz needs >=3.7 s of 24 kHz audio) are
        # zero-padded; XLA otherwise produces SILENT 0-length maps and the
        # time-mean logit becomes NaN (torch would hard-error instead).
        min_len = 1
        for k, s in reversed(list(zip(kernel_sizes, strides))):
            min_len = (min_len - 1) * s + k
        if h.shape[1] < min_len:
            h = jnp.pad(h, ((0, 0), (0, min_len - h.shape[1]), (0, 0)))
        fmap = []
        for i, (k, s, c, g) in enumerate(zip(kernel_sizes, strides, chans, groups)):
            h = nn.Conv(
                c, (k,), strides=(s,), padding="VALID", feature_group_count=g,
                name=f"conv{i}",
            )(h)
            h = _lrelu(h)
            fmap.append(h)
        h = nn.Conv(1, (1,), name="postnet")(h)
        logits = jnp.mean(h, axis=-2)  # average over time -> [B, 1]
        return logits, fmap


class MultiWaveDiscriminator(nn.Module):
    sample_rates: Tuple[int, ...] = (8000, 12000, 16000, 24000)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        logits, fmaps = [], []
        for sr in self.sample_rates:
            lg, fm = WaveDiscriminator(sample_rate=sr, name=f"wave{sr}")(x)
            logits.append(lg)
            fmaps.append(fm)
        return logits, fmaps


def _instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm2d(affine=False) on NHWC: normalize over H, W per channel."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps)


class MelspecDiscriminator(nn.Module):
    """2-D convs + InstanceNorm + GLU over the log-mel spectrogram
    (hifigan_dicriminator.py:11-70)."""

    n_fft: int = 2048
    win_length: int = 600
    hop_length: int = 240
    n_mels: int = 128

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        mel = melspectrogram(
            x,
            MelConfig(
                sample_rate=SAMPLE_RATE, n_fft=self.n_fft,
                win_length=self.win_length, hop_length=self.hop_length,
                n_mels=self.n_mels,
            ),
        )  # [B, M, T]
        h = jnp.log(mel + 1e-5)[..., None]  # [B, M, T, 1]

        kernel_sizes = ((7, 7), (4, 4), (4, 4), (4, 4))
        # Minimum time-frame count so the stride-2 stack and the VALID
        # (15, 5) postnet never produce an empty map (whose mean is NaN).
        # Walk the required width backwards; pad with log-silence.
        min_w = 5  # postnet needs >= 5 frames
        for k in reversed(kernel_sizes):
            min_w = (min_w - 1) * 2 + k[1] - 4  # pad (2, 2) per side
        assert self.n_mels >= 22, "postnet needs >= 22 mel bins"
        if h.shape[2] < min_w:
            h = jnp.pad(
                h, ((0, 0), (0, 0), (0, min_w - h.shape[2]), (0, 0)),
                constant_values=float(np.log(1e-5)),
            )
        fmap = []
        for i, k in enumerate(kernel_sizes):
            h = nn.Conv(
                64, k, strides=(1, 2), padding=((1, 1), (2, 2)), use_bias=False,
                name=f"conv{i}",
            )(h)
            h = _instance_norm(h)
            a, g = jnp.split(h, 2, axis=-1)  # GLU over channels
            h = a * jax.nn.sigmoid(g)
            fmap.append(h)

        h = nn.Conv(1, (15, 5), strides=(1, 2), padding="VALID", name="postnet")(h)
        logits = jnp.mean(h, axis=(1, 2))  # [B, 1]
        return logits, fmap


class MultiMelSpecDiscriminator(nn.Module):
    n_ffts: Tuple[int, ...] = (1024, 256, 512)
    win_lengths: Tuple[int, ...] = (960, 240, 480)
    hop_lengths: Tuple[int, ...] = (240, 60, 120)
    n_mels: Tuple[int, ...] = (128, 64, 80)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        logits, fmaps = [], []
        for i, (nf, wl, hp, nm) in enumerate(
            zip(self.n_ffts, self.win_lengths, self.hop_lengths, self.n_mels)
        ):
            lg, fm = MelspecDiscriminator(
                n_fft=nf, win_length=wl, hop_length=hp, n_mels=nm, name=f"mel{i}"
            )(x)
            logits.append(lg)
            fmaps.append(fm)
        return logits, fmaps


class HifiganVocoderDiscriminator24kMVD(nn.Module):
    """The shipping composite D: MPD + multi-rate wave + multi-mel
    (hifigan_dicriminator.py:201-254)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        lg_mpd, fm_mpd = MultiPeriodDiscriminator(name="MPD")(x)
        lg_mvd, fm_mvd = MultiWaveDiscriminator(name="MVD")(x)
        lg_mmd, fm_mmd = MultiMelSpecDiscriminator(
            n_ffts=(1024, 256, 512), win_lengths=(960, 240, 480),
            hop_lengths=(240, 60, 120), n_mels=(128, 64, 80), name="MMD",
        )(x)
        logits = [lg_mpd, lg_mvd, lg_mmd]
        features = [fm_mpd, fm_mvd, fm_mmd]
        return logits, features


class HifiganVocoderDiscriminator24k(nn.Module):
    """MPD + DWT multi-scale + multi-mel variant
    (hifigan_dicriminator.py:123-198)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        from use_tpu.models.gan.msd import MultiScaleDiscriminator

        lg_mpd, fm_mpd = MultiPeriodDiscriminator(name="MPD")(x)
        lg_msd, fm_msd = MultiScaleDiscriminator(name="MSD")(x)
        lg_mmd, fm_mmd = MultiMelSpecDiscriminator(
            n_ffts=(1024, 256, 512), win_lengths=(960, 240, 480),
            hop_lengths=(240, 60, 120), n_mels=(128, 64, 80), name="MMD",
        )(x)
        return [lg_mpd, lg_msd, lg_mmd], [fm_mpd, fm_msd, fm_mmd]


DiscriminatorRegistry.register("hifigan_vocoder_discriminator_24k_MVD")(
    HifiganVocoderDiscriminator24kMVD
)
DiscriminatorRegistry.register("hifigan_vocoder_discriminator_24k")(
    HifiganVocoderDiscriminator24k
)
