"""HiFi-GAN+ bandwidth-extension generator (WaveNet stack), in Flax.

Re-implementation of the reference's alternative generator (reference:
GAN/discriminator/hifigan/open_models.py:37-254): kaiser-window bandlimited
upsampling to the target rate, then a stack of non-causal gated residual
WaveNet layers with a tanh output, with receptive-field padding to suppress
edge artifacts.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from use_tpu.models.registry import GeneratorRegistry
from use_tpu.ops.resample import resample

SAMPLE_RATE = 24000


class WaveNetLayer(nn.Module):
    """Gated residual layer (open_models.py:283-332... WaveNetLayer)."""

    channels: int
    kernel_size: int = 3
    dilation: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        r = x
        h = nn.Conv(
            self.channels, (self.kernel_size,), kernel_dilation=(self.dilation,),
            padding="SAME", name="conv",
        )(x)
        a, g = jnp.split(h, 2, axis=-1)
        h = jnp.tanh(a) * jax.nn.sigmoid(g)
        s = nn.Conv(self.channels, (1,), name="conv_skip")(h)
        out = nn.Conv(self.channels, (1,), name="conv_out")(h)
        out = (out + r) * np.float32(np.sqrt(0.5))
        return out, s


class WaveNet(nn.Module):
    """(open_models.py:133-199)."""

    stacks: int = 2
    layers: int = 8
    wavenet_channels: int = 128
    out_channels: int = 1
    kernel_size: int = 3
    dilation_base: int = 3

    @property
    def receptive_field(self) -> int:
        return (
            (self.kernel_size - 1) * self.stacks
            * sum(self.dilation_base ** i for i in range(self.layers))
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.wavenet_channels, (1,), name="conv_in")(x)
        s = 0.0
        n = 0
        for st in range(self.stacks):
            for i in range(self.layers):
                h, skip = WaveNetLayer(
                    self.wavenet_channels, self.kernel_size, self.dilation_base ** i,
                    name=f"layer{st}_{i}",
                )(h)
                s = s + skip
                n += 1
        s = s * np.float32(np.sqrt(1.0 / n))
        return nn.Conv(self.out_channels, (1,), name="conv_out")(s)


class BandwidthExtender(nn.Module):
    """[B, L] at source_rate -> [B, L'] at SAMPLE_RATE
    (open_models.py:74-131)."""

    sample_rate: int = SAMPLE_RATE

    @nn.compact
    def __call__(self, x: jnp.ndarray, source_rate: int) -> jnp.ndarray:
        if source_rate != self.sample_rate:
            x = resample(
                x, source_rate, self.sample_rate,
                lowpass_filter_width=16, rolloff=0.945,
                resampling_method="sinc_interp_kaiser", beta=14.769656459379492,
            )
        net = WaveNet()
        pad = net.receptive_field // 2
        h = jnp.pad(x, ((0, 0), (pad, pad)))[..., None]
        h = jnp.tanh(net(h))[..., 0]
        return h[:, pad:-pad]


GeneratorRegistry.register("hifigan_bwe")(BandwidthExtender)
