"""Spectrogram discriminators (hifigan.py:479-611), in Flax.

Input [B, T] waveform -> magnitude STFT (no grad through the STFT, like the
reference's torch.no_grad block) -> conv stack over the frequency-as-channel
layout [B, T_frames, 1, F->C].
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from use_tpu.ops.stft import STFTConfig, stft


class SpecDiscriminator(nn.Module):
    channels: int = 32
    init_kernel: int = 15
    kernel_size: int = 11
    stride: int = 2
    fft_size: int = 1024
    shift_size: int = 120
    win_length: int = 600
    blocks: int = 3

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        cfg = STFTConfig(
            n_fft=self.fft_size, hop_length=self.shift_size,
            win_length=self.win_length, center=True,
        )
        spec = jax.lax.stop_gradient(stft(wav, cfg))
        # magnitude floor exactly as the reference: sqrt(clamp(|s|^2, 1e-7))
        # (audio_torch.py:29)
        mag = jnp.sqrt(
            jnp.maximum(jnp.sum(jnp.square(spec), axis=-1), 1e-7)
        )  # [B, F, T]
        # reference layout: freq bins as input channels, conv over frames
        x = jnp.transpose(mag, (0, 2, 1))[:, :, None, :]  # [B, T, 1, F]

        lrelu = lambda h: jax.nn.leaky_relu(h, negative_slope=0.1)
        fmap = []
        x = nn.Conv(
            self.channels, (self.init_kernel, 1),
            padding=((self.init_kernel - 1) // 2, (self.init_kernel - 1) // 2),
            name="conv_in",
        )(x)
        x = lrelu(x)
        fmap.append(x)
        for i in range(self.blocks):
            x = nn.Conv(
                self.channels, (self.kernel_size, 1), strides=(self.stride, 1),
                padding=((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2),
                name=f"conv{i}",
            )(x)
            x = lrelu(x)
            fmap.append(x)
        x = nn.Conv(self.channels, (5, 1), padding=(2, 2), name="conv_final")(x)
        x = lrelu(x)
        fmap.append(x)
        x = nn.Conv(1, (3, 1), padding=((1, 1), (0, 0)), name="conv_post")(x)
        fmap.append(x)
        return x[..., 0], fmap  # [B, T', 1]


class MultiSpecDiscriminator(nn.Module):
    fft_sizes: Tuple[int, ...] = (1024, 2048, 512)
    hop_sizes: Tuple[int, ...] = (120, 240, 50)
    win_lengths: Tuple[int, ...] = (600, 1200, 240)
    channels: int = 15
    init_kernel: int = 1

    @nn.compact
    def __call__(self, wav: jnp.ndarray):
        logits, fmaps = [], []
        for i, (nf, hp, wl) in enumerate(
            zip(self.fft_sizes, self.hop_sizes, self.win_lengths)
        ):
            lg, fm = SpecDiscriminator(
                channels=self.channels, init_kernel=self.init_kernel,
                fft_size=nf, shift_size=hp, win_length=wl, name=f"spec{i}",
            )(wav)
            logits.append(lg)
            fmaps.append(fm)
        return logits, fmaps
