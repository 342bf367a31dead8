"""CSMGAN: causal/streaming STFT U-Net generator, in Flax.

Re-implementation of the reference's alternative generator (reference:
GAN/generator/CSMGAN/generator5_24k.py:12-788): GLFB blocks (gated depthwise
conv + channel-SE + freq-SE with cumulative layer norm), a causal TCN
bottleneck over the flattened C x F axis, PixelShuffle frequency-upsampling
decoder, and causal 2-D convolutions throughout (left-padded in time,
symmetric in frequency) so the network is streamable.

Layout: activations are [B, T, F, C] (time first so causal padding is the
leading spatial axis). The wrapper owns the 481-bin STFTFeature front-end
and consumes/produces the batch dict like the reference
(CSMGAN_Wrapper.forward:747-761).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from use_tpu.models.registry import GeneratorRegistry

EPS = 1e-6


def _cumulative_stats(sums: jnp.ndarray, pow_sums: jnp.ndarray, per_step: int, axis: int):
    """Cumulative mean/std over a time axis given per-step channel sums."""
    cum_sum = jnp.cumsum(sums, axis=axis)
    cum_pow = jnp.cumsum(pow_sums, axis=axis)
    t = sums.shape[axis]
    shape = [1] * sums.ndim
    shape[axis] = t
    cnt = (np.arange(1, t + 1, dtype=np.float32) * per_step).reshape(shape)
    mean = cum_sum / cnt
    # clamp: the E[x^2]-E[x]^2 form can go slightly negative under
    # catastrophic cancellation, and sqrt(negative) poisons training
    var = jnp.maximum(cum_pow / cnt - mean ** 2, 0.0)
    return mean, var


class CumLN1d(nn.Module):
    """Cumulative layer norm over [B, T, C] (generator5_24k.py cLN:12-49)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gain = self.param("gain", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        mean, var = _cumulative_stats(
            jnp.sum(x, -1, keepdims=True), jnp.sum(x ** 2, -1, keepdims=True), c, 1
        )
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gain + bias


class CumLN2d(nn.Module):
    """Cumulative layer norm over [B, T, F, C] (CumLN2d:342-362)."""

    eps: float = EPS

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        mean, var = _cumulative_stats(
            jnp.sum(x, -1, keepdims=True), jnp.sum(x ** 2, -1, keepdims=True), c, 1
        )
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


class CausalConv2d(nn.Module):
    """Conv with left-only time padding, symmetric freq padding (:365-389)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kf = self.kernel_size
        pt = (kt - 1) * self.dilation[0]
        pf = (kf - 1) * self.dilation[1] // 2
        x = jnp.pad(x, ((0, 0), (pt, 0), (pf, pf), (0, 0)))
        return nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding="VALID",
            kernel_dilation=self.dilation, feature_group_count=self.groups,
            use_bias=self.use_bias,
        )(x)


def gate(x: jnp.ndarray) -> jnp.ndarray:
    a, g = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(g)


class SeChannelModule(nn.Module):
    """Freq-pooled channel attention with causal time smoothing (:458-471)."""

    channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = jnp.mean(x, axis=2, keepdims=True)  # [B, T, 1, C]
        smoothed = CausalConv2d(self.channels, (3, 1), use_bias=False)(pooled)
        return x * smoothed


class SeFreqModule(nn.Module):
    """Channel-pooled frequency attention (:474-489)."""

    freq_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # pool over channels -> [B, T, F]; treat F as channels for the 1x1
        pooled = jnp.mean(x, axis=-1)[:, :, None, :]  # [B, T, 1, F]
        smoothed = CausalConv2d(self.freq_dim, (1, 1), use_bias=False)(pooled)
        return x * jnp.swapaxes(smoothed, 2, 3)  # [B, T, F, 1] broadcast


def get_norm(norm: str):
    if norm == "CLN":
        return CumLN2d
    if norm in ("BN", "SyncBN"):
        # batch-independent substitute: flax GroupNorm(1) == LayerNorm over C
        return lambda: nn.GroupNorm(num_groups=1, epsilon=1e-5)
    if norm == "IN":
        return lambda: nn.GroupNorm(num_groups=1, epsilon=1e-5)
    raise NotImplementedError(f"Unsupported normalization: {norm}")


class GLFB(nn.Module):
    """Gated local-frequency block (:506-541)."""

    channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    dilation: Tuple[int, int] = (1, 1)
    norm: str = "CLN"
    freq_dim: int = 480

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        beta = self.param("beta", nn.initializers.ones, (c,))
        gamma = self.param("gamma", nn.initializers.ones, (c,))

        h = get_norm(self.norm)()(x)
        h = nn.Conv(2 * c, (1, 1), use_bias=False)(h)
        h = CausalConv2d(
            2 * c, self.kernel_size, dilation=self.dilation, groups=2 * c,
        )(h)
        h = gate(h)
        h = SeChannelModule(c)(h)
        h = SeFreqModule(self.freq_dim)(h)
        h = nn.Conv(c, (1, 1), use_bias=False)(h)
        x = x + h * beta

        h = get_norm(self.norm)()(x)
        h = nn.Conv(2 * c, (1, 1), use_bias=False)(h)
        h = gate(h)
        h = nn.Conv(c, (1, 1), use_bias=False)(h)
        return x + h * gamma


class DepthConv1d(nn.Module):
    """Causal dilated depthwise TCN block over [B, T, C] (:158-205)."""

    input_channel: int
    hidden_channel: int
    kernel: int = 3
    dilation: int = 1
    skip: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = nn.Conv(self.hidden_channel, (1,))(x)
        h = nn.PReLU()(h)
        h = CumLN1d()(h)
        pad = (self.kernel - 1) * self.dilation
        h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        h = nn.Conv(
            self.hidden_channel, (self.kernel,), kernel_dilation=(self.dilation,),
            feature_group_count=self.hidden_channel, padding="VALID",
        )(h)
        h = nn.PReLU()(h)
        h = CumLN1d()(h)
        residual = nn.Conv(self.input_channel, (1,))(h)
        if self.skip:
            return residual, nn.Conv(self.input_channel, (1,))(h)
        return residual, None


class TCN(nn.Module):
    """Causal TCN bottleneck (:209-297)."""

    input_dim: int
    output_dim: int
    bn_dim: int
    hidden_dim: int
    layer: int = 6
    stack: int = 2
    kernel: int = 3
    skip: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = CumLN1d()(x)
        h = nn.Conv(self.bn_dim, (1,))(h)
        skip_sum = 0.0
        for s in range(self.stack):
            for i in range(self.layer):
                res, skip = DepthConv1d(
                    self.bn_dim, self.hidden_dim, self.kernel, dilation=2 ** i,
                    skip=self.skip,
                )(h)
                h = h + res
                if self.skip:
                    skip_sum = skip_sum + skip
        out = skip_sum if self.skip else h
        out = nn.PReLU()(out)
        return nn.Conv(self.output_dim, (1,))(out)


class PixelShuffleBlock(nn.Module):
    """Causal conv + frequency pixel shuffle x2 (:392-437)."""

    out_channels: int
    upscale_factor: int = 2
    kernel_size: Tuple[int, int] = (3, 3)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        h = CausalConv2d(
            self.out_channels * self.upscale_factor, self.kernel_size, use_bias=False
        )(x)
        bt, t, f, c = h.shape
        # channel-major shuffle into frequency (PixelShuffle:396-410)
        h = h.reshape(b, t, f, self.upscale_factor, c // self.upscale_factor)
        h = jnp.swapaxes(h, 2, 3).reshape(b, t, f * self.upscale_factor, c // self.upscale_factor)
        return h


class CSMGAN(nn.Module):
    """Encoder - TCN - decoder over [B, T, F, 2] spectra (:603-688)."""

    in_proj_channels: int = 8
    encoder_channels: Tuple[int, ...] = (8, 8, 16, 16, 24)
    encoder_depths: Tuple[int, ...] = (1, 2, 1, 2)
    encoder_glfb_kernel: Tuple[int, int] = (3, 3)
    tcn_input_dim: int = 720
    tcn_bn_dim: int = 600
    tcn_hidden_dim: int = 600
    tcn_layers: int = 6
    tcn_stacks: int = 2
    tcn_kernel: int = 3
    decoder_depths: Tuple[int, ...] = (1, 2, 1, 2)
    decoder_glfb_kernel: Tuple[int, int] = (3, 3)
    glfb_norm: str = "CLN"
    input_freq: int = 480

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = CausalConv2d(self.in_proj_channels, (3, 3), name="in_proj")(x)

        skips = []
        for i, depth in enumerate(self.encoder_depths):
            for d in range(depth):
                x = GLFB(
                    channels=self.encoder_channels[i],
                    kernel_size=self.encoder_glfb_kernel,
                    dilation=(2 ** d, 1), norm=self.glfb_norm,
                    freq_dim=self.input_freq // 2 ** i,
                    name=f"enc{i}_glfb{d}",
                )(x)
            skips.append(x)
            # freq downsample x2: kernel (1,6) stride (1,2) pad (0,2)
            x = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)))
            x = nn.Conv(
                self.encoder_channels[i + 1], (1, 6), strides=(1, 2),
                padding="VALID", use_bias=False, name=f"down{i}",
            )(x)

        b, t, f, c = x.shape
        # torch flattens (C, F) channel-major (forward:679-682): [B,C,F,T] view
        flat = jnp.transpose(x, (0, 3, 2, 1)).reshape(b, c * f, t)
        flat = jnp.swapaxes(flat, 1, 2)  # [B, T, C*F]
        flat = TCN(
            input_dim=self.tcn_input_dim, output_dim=self.tcn_input_dim,
            bn_dim=self.tcn_bn_dim, hidden_dim=self.tcn_hidden_dim,
            layer=self.tcn_layers, stack=self.tcn_stacks, kernel=self.tcn_kernel,
            name="bottleneck",
        )(flat)
        x = jnp.swapaxes(flat, 1, 2).reshape(b, c, f, t)
        x = jnp.transpose(x, (0, 3, 2, 1))  # back to [B, T, F, C]

        for i, depth in enumerate(self.decoder_depths):
            out_ch = self.encoder_channels[-i - 2]
            x = PixelShuffleBlock(out_ch, name=f"up{i}")(x)
            x = x + skips[-i - 1]
            for d in range(depth):
                x = GLFB(
                    channels=out_ch, kernel_size=self.decoder_glfb_kernel,
                    dilation=(2 ** d, 1), norm=self.glfb_norm,
                    freq_dim=self.input_freq // 2 ** (len(self.encoder_depths) - i - 1),
                    name=f"dec{i}_glfb{d}",
                )(x)

        return CausalConv2d(2, (3, 3), name="out_proj")(x)


class CSMGANWrapper:
    """Batch-dict wrapper with the STFT front-end (:691-761)."""

    def __init__(
        self,
        n_fft: int = 960,
        win_length: int = 960,
        hop_length: int = 480,
        window: str = "hann",
        sampling_rate: int = 24000,
        compression=None,
        input_freq: int = 480,
        **net_kwargs,
    ):
        from use_tpu.ops.stft_feature import STFTFeature

        self.feature = STFTFeature(
            n_fft=n_fft, win_length=win_length, hop_length=hop_length,
            window=window, sampling_rate=sampling_rate, compression=compression,
            inverse_keys=["fake"],
        )
        self.net = CSMGAN(input_freq=input_freq, **net_kwargs)

    def init_params(self, rng, num_frames: int = 16):
        freq = self.feature.n_fft // 2 + 1
        spec = jnp.zeros((1, num_frames, freq - 1, 2))
        return self.net.init(rng, spec)["params"]

    def __call__(self, params, batch):
        batch = self.feature(batch)
        spec = batch["perturbed_spectra"]  # [B, F, T, 2]
        x = jnp.transpose(spec, (0, 2, 1, 3))[:, :, :-1, :]  # [B, T, F-1, 2]
        y = self.net.apply({"params": params}, x)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 1), (0, 0)))
        batch["fake_spectra"] = jnp.transpose(y, (0, 2, 1, 3))
        return self.feature.inverse(batch)


GeneratorRegistry.register("csmgan")(CSMGANWrapper)
