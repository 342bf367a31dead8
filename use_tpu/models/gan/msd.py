"""Multi-scale discriminator with DWT downsampling (hifigan.py:303-477).

The reference uses pytorch_wavelets' DWT1DForward(db3, J=1) between scales;
here the single-level db3 analysis is two strided FIR convolutions (low/high
band), followed by the aux 1-D conv that fuses the two bands back to one
channel — all plain XLA convs.
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Daubechies-3 decomposition filters (standard published coefficients).
_DB3_DEC_LO = np.array(
    [0.03522629188210, -0.08544127388224, -0.13501102001039,
     0.45987750211933, 0.80689150931334, 0.33267055295096], np.float64
)
_DB3_DEC_HI = np.array(
    [-0.33267055295096, 0.80689150931334, -0.45987750211933,
     -0.13501102001039, 0.08544127388224, 0.03522629188210], np.float64
)


def dwt1d_db3(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Single-level db3 DWT of [B, T, 1] -> (lo [B, T/2, 1], hi [B, T/2, 1]).

    Zero-padding boundary; matches pytorch_wavelets mode='zero' output length
    floor((T + len-1)/2).
    """
    flt = np.stack([_DB3_DEC_LO, _DB3_DEC_HI], axis=1).astype(np.float32)
    k = jnp.asarray(flt[::-1].copy())[:, None, :]  # [K, 1, 2] (conv = corr w/ flip)
    pad = len(_DB3_DEC_LO) - 2
    y = jax.lax.conv_general_dilated(
        x, k, window_strides=(2,), padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    return y[..., :1], y[..., 1:]


class ScaleDiscriminator(nn.Module):
    """1-D conv stack over the raw/downsampled waveform (hifigan.py:303-405).

    Input [B, T, C]. (Spectral norm on scale 0 in the reference is a training
    regularizer; omitted here — plain kernels.)
    """

    kernel_sizes: Tuple[int, ...] = (15, 41, 5, 3)
    channels: int = 128
    max_downsample_channels: int = 1024
    max_groups: int = 16
    downsample_scales: Tuple[int, ...] = (2, 2, 4, 4, 1)

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        lrelu = lambda h: jax.nn.leaky_relu(h, negative_slope=0.1)
        fmap = []
        k0, k1, k2, k3 = self.kernel_sizes
        h = nn.Conv(self.channels, (k0,), padding=(k0 - 1) // 2, name="conv0")(x)
        h = lrelu(h)
        fmap.append(h)

        in_chs = out_chs = self.channels
        groups = 4
        for i, scale in enumerate(self.downsample_scales):
            h = nn.Conv(
                out_chs, (k1,), strides=(scale,), padding=(k1 - 1) // 2,
                feature_group_count=groups, name=f"conv{i + 1}",
            )(h)
            h = lrelu(h)
            fmap.append(h)
            in_chs = out_chs
            out_chs = min(in_chs * 2, self.max_downsample_channels)
            groups = min(groups * 4, self.max_groups)

        out_chs = min(in_chs * 2, self.max_downsample_channels)
        h = nn.Conv(out_chs, (k2,), padding=(k2 - 1) // 2, name="conv_pre_post")(h)
        h = lrelu(h)
        fmap.append(h)
        h = nn.Conv(1, (k3,), padding=(k3 - 1) // 2, name="conv_post")(h)
        fmap.append(h)
        logits = h.reshape(h.shape[0], -1)
        return logits, fmap


class MultiScaleDiscriminator(nn.Module):
    """3 scales with db3-DWT downsampling + aux fuse conv (hifigan.py:408-477)."""

    scales: int = 3

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        y = x[..., None]  # [B, T, 1]
        logits, fmaps = [], []
        for i in range(self.scales):
            if i != 0:
                lo, hi = dwt1d_db3(y)
                y = jnp.concatenate([lo, hi], axis=-1)
                y = nn.Conv(1, (15,), padding=7, name=f"aux_conv{i - 1}")(y)
                y = jax.nn.leaky_relu(y, negative_slope=0.1)
            lg, fm = ScaleDiscriminator(name=f"scale{i}")(y)
            logits.append(lg)
            fmaps.append(fm)
        return logits, fmaps
