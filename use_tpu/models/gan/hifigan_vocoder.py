"""HiFi-GAN vocoder generator (mel -> waveform), in Flax.

Re-implementation of the reference's full HiFi-GAN Generator (reference:
GAN/discriminator/hifigan_vocoder/hifigan.py:24-199 + layers.py:53-286):
dual-path upsampling (repeat-upsample conv + transposed conv, summed), banks
of multi-kernel/multi-dilation residual blocks averaged per stage, optional
causal convolutions, optional NSF harmonic excitation source.

Layout: [B, T, C]. Weight norm is a torch reparametrization; plain kernels
here (fold g*v/||v|| at conversion).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from use_tpu.models.registry import GeneratorRegistry


def _lrelu(x):
    return jax.nn.leaky_relu(x, negative_slope=0.1)


class Conv1dC(nn.Module):
    """1-D conv; causal mode left-pads (k-1)*dilation (layers.py:53-91)."""

    features: int
    kernel_size: int
    dilation: int = 1
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        pad = (self.kernel_size - 1) * self.dilation
        if self.causal:
            x = jnp.pad(x, ((0, 0), (pad, 0), (0, 0)))
            return nn.Conv(
                self.features, (self.kernel_size,), kernel_dilation=(self.dilation,),
                padding="VALID",
            )(x)
        return nn.Conv(
            self.features, (self.kernel_size,), kernel_dilation=(self.dilation,),
            padding=pad // 2,
        )(x)


class ConvTranspose1dC(nn.Module):
    """Transposed conv; causal trims (k - stride) from the tail
    (layers.py:126-166)."""

    features: int
    kernel_size: int
    stride: int
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        y = nn.ConvTranspose(
            self.features, (self.kernel_size,), strides=(self.stride,),
            padding="VALID",
        )(x)
        pad = self.kernel_size - self.stride
        if self.causal:
            return y[:, :-pad] if pad > 0 else y
        half = pad // 2
        return y[:, half : y.shape[1] - (pad - half)] if pad > 0 else y


class ResidualBlock(nn.Module):
    """(layers.py:170-226)."""

    channels: int
    kernel_size: int = 3
    dilation: Tuple[int, ...] = (1, 3, 5)
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilation):
            xt = _lrelu(x)
            xt = Conv1dC(self.channels, self.kernel_size, d, self.causal,
                         name=f"conv1_{i}")(xt)
            xt = _lrelu(xt)
            xt = Conv1dC(self.channels, self.kernel_size, 1, self.causal,
                         name=f"conv2_{i}")(xt)
            x = xt + x
        return x


class SourceModule(nn.Module):
    """NSF harmonic-plus-noise excitation (layers.py:229-283). Needs an
    explicit rng ('source') for the phase/noise draws."""

    nb_harmonics: int
    upsample_ratio: int
    sampling_rate: int
    alpha: float = 0.1
    sigma: float = 0.003

    @nn.compact
    def __call__(self, pitch, uv):
        # pitch/uv: [B, T_frames, 1]
        r = self.upsample_ratio
        pitch_s = jnp.repeat(pitch, r, axis=1)
        uv_s = jnp.repeat(uv, r, axis=1)
        harmonics = jnp.arange(1, self.nb_harmonics + 2, dtype=pitch.dtype)
        f_mat = pitch_s * harmonics[None, None, :] / self.sampling_rate
        theta = 2 * np.pi * (jnp.cumsum(f_mat, axis=1) % 1.0)
        rng = self.make_rng("source")
        r1, r2 = jax.random.split(rng)
        phase = jax.random.uniform(
            r1, (pitch.shape[0], 1, self.nb_harmonics + 1),
            minval=-np.pi, maxval=np.pi,
        ).at[:, :, 0].set(0.0)
        noise = self.sigma * jax.random.normal(r2, f_mat.shape)
        e_voice = self.alpha * jnp.sin(theta + phase) + noise
        e_unvoice = self.alpha / 3 / self.sigma * noise
        e = e_voice * uv_s + e_unvoice * (1 - uv_s)
        e = jax.lax.stop_gradient(e)
        return jnp.tanh(nn.Conv(1, (1,), name="ffn")(e))


class HifiganGenerator(nn.Module):
    """(hifigan.py:24-199). Input mel [B, T, in_channels] -> wav [B, T*prod]."""

    in_channels: int = 80
    out_channels: int = 1
    channels: int = 512
    kernel_size: int = 7
    upsample_scales: Tuple[int, ...] = (8, 8, 2, 2)
    upsample_kernel_sizes: Tuple[int, ...] = (16, 16, 4, 4)
    resblock_kernel_sizes: Tuple[int, ...] = (3, 7, 11)
    resblock_dilations: Tuple[Tuple[int, ...], ...] = ((1, 3, 5),) * 3
    repeat_upsample: bool = True
    causal: bool = True
    use_conv_post: bool = True
    use_out_tanh: bool = True
    nsf_params: Optional[dict] = None

    @nn.compact
    def __call__(self, x):
        nsf = self.nsf_params is not None
        if nsf:
            mel, pitch, uv = x[..., :-2], x[..., -2:-1], x[..., -1:]
            excitation = SourceModule(
                nb_harmonics=self.nsf_params["nb_harmonics"],
                upsample_ratio=int(np.prod(self.upsample_scales)),
                sampling_rate=self.nsf_params["sampling_rate"],
                name="source_module",
            )(pitch, uv)
        else:
            mel = x

        h = Conv1dC(self.channels, self.kernel_size, 1, self.causal,
                    name="conv_pre")(mel)
        num_kernels = len(self.resblock_kernel_sizes)
        down_cum = [1] + list(np.cumprod(self.upsample_scales)[:-1])
        for i, (scale, k_up) in enumerate(
            zip(self.upsample_scales, self.upsample_kernel_sizes)
        ):
            ch = self.channels // (2 ** (i + 1))
            h = jnp.sin(h) + h  # hifigan.py:159
            rep = jnp.repeat(h, scale, axis=1)
            rep = Conv1dC(ch, self.kernel_size, 1, self.causal,
                          name=f"repeat_up{i}")(_lrelu(rep))
            up = ConvTranspose1dC(ch, k_up, scale, self.causal,
                                  name=f"transpose_up{i}")(_lrelu(h))
            h = rep + up[:, : rep.shape[1]]
            if nsf:
                # downsample the excitation to this stage's rate
                # (hifigan.py:126-145): stride u conv with kernel 2u
                u = int(np.prod(self.upsample_scales[i + 1 :]))
                if u > 1:
                    e = nn.Conv(
                        ch, (u * 2,), strides=(u,), padding=u // 2,
                        name=f"source_down{i}",
                    )(excitation)
                else:
                    e = nn.Conv(ch, (1,), name=f"source_down{i}")(excitation)
                h = h + e[:, : h.shape[1]]
            xs = 0.0
            for j, (rk, rd) in enumerate(
                zip(self.resblock_kernel_sizes, self.resblock_dilations)
            ):
                xs = xs + ResidualBlock(
                    ch, rk, rd, self.causal, name=f"resblock{i}_{j}",
                )(h)
            h = xs / num_kernels

        # the reference's FINAL activation is F.leaky_relu's default slope
        # 0.01, unlike the 0.1 used everywhere else (hifigan.py:178)
        h = jax.nn.leaky_relu(h, negative_slope=0.01)
        if self.use_conv_post:
            h = Conv1dC(self.out_channels, self.kernel_size, 1, self.causal,
                        name="conv_post")(h)
        if self.use_out_tanh:
            h = jnp.tanh(h)
        return h[..., 0] if self.out_channels == 1 else h


GeneratorRegistry.register("hifigan_generator")(HifiganGenerator)
