"""upfirdn2d and FIR up/down-sampling, TPU-native.

The reference ships this as a custom CUDA op (reference: src/models/components/
sgmse/backbones/ncsnpp_utils/op/upfirdn2d.py:162-208 + upfirdn2d_kernel.cu)
with semantics: zero-insert upsample by `up` -> pad -> 2-D FIR convolution ->
downsample by `down`.

On TPU this is exactly one `lax.conv_general_dilated` call with
``lhs_dilation=up``, explicit padding, ``window_strides=down`` and a
depthwise (per-channel) kernel — XLA tiles it onto the convolution units
directly, and the FIR kernels used by NCSN++ are separable outer products of
[1, 3, 3, 1] (up_or_down_sampling.py:188-195), so the default path runs two
tiny rank-1 convolutions instead of one dense 2-D one.

Layout: NHWC (``[B, H, W, C]``) throughout — the TPU-native conv layout.
Gradients come from JAX autodiff of the conv (no hand-written double
backward needed, unlike the CUDA op).
"""
from __future__ import annotations

import functools
import os
from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


def setup_kernel(k: Sequence[float]) -> np.ndarray:
    """Normalize a FIR kernel; 1-D inputs become separable outer products.

    Reference parity: up_or_down_sampling.py:188-195 (_setup_kernel).
    """
    k = np.asarray(k, dtype=np.float32)
    if k.ndim == 1:
        k = np.outer(k, k)
    k /= np.sum(k)
    assert k.ndim == 2 and k.shape[0] == k.shape[1]
    return k


def _depthwise_conv(
    x: jnp.ndarray,
    kernel: jnp.ndarray,  # [kh, kw]
    up: Tuple[int, int],
    down: Tuple[int, int],
    pad: Tuple[Tuple[int, int], Tuple[int, int]],
) -> jnp.ndarray:
    c = x.shape[-1]
    # upfirdn is a *convolution*; lax conv is a correlation -> flip kernel.
    k = jnp.flip(kernel, (0, 1)).astype(x.dtype)
    k = jnp.broadcast_to(k[:, :, None, None], (*kernel.shape, 1, c))
    # zero-insert upsampling keeps `up-1` trailing zeros after the last
    # sample (H*up total); lhs_dilation yields (H-1)*up+1, so fold the
    # missing trailing zeros into the high-side padding.
    pad = tuple((p0, p1 + u - 1) for (p0, p1), u in zip(pad, up))
    return jax.lax.conv_general_dilated(
        x,
        k,
        window_strides=down,
        padding=pad,
        lhs_dilation=up,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def upfirdn2d(
    x: jnp.ndarray,
    kernel: Union[np.ndarray, jnp.ndarray],
    up: int = 1,
    down: int = 1,
    pad: Tuple[int, int] = (0, 0),
) -> jnp.ndarray:
    """pad -> upsample-by-zeros -> FIR filter -> downsample on [B, H, W, C].

    Matches the reference CUDA op (op/upfirdn2d.py:162-170): `pad` is
    (before, after), applied to both spatial dims. Negative pads crop.
    """
    kernel = jnp.asarray(kernel)
    assert kernel.ndim == 2
    if min(pad) < 0:
        # Negative pad = crop of the zero-upsampled input (rare; unused by
        # the NCSN++ configs, kept for exact API parity). Materialize the
        # zero-insert upsample, crop, then filter without extra padding.
        b, h, w, c = x.shape
        ux = jnp.zeros((b, h * up, w * up, c), x.dtype)
        ux = ux.at[:, ::up, ::up, :].set(x)
        h0, h1 = -min(pad[0], 0), -min(pad[1], 0)
        ux = ux[:, h0 : ux.shape[1] - h1, h0 : ux.shape[2] - h1, :]
        p = ((max(pad[0], 0), max(pad[1], 0)),) * 2
        return _depthwise_conv(ux, kernel, (1, 1), (down, down), p)
    p = ((pad[0], pad[1]), (pad[0], pad[1]))
    return _depthwise_conv(x, kernel, (up, up), (down, down), p)


def _separable_fir(
    x: jnp.ndarray,
    k1: np.ndarray,  # 1-D kernel (already gain-scaled)
    up: int,
    down: int,
    pad: Tuple[int, int],
) -> jnp.ndarray:
    """Two rank-1 passes of upfirdn for separable kernels (H then W)."""
    c = x.shape[-1]
    kh = jnp.asarray(k1[::-1].copy(), x.dtype)
    kcol = jnp.broadcast_to(kh[:, None, None, None], (len(k1), 1, 1, c))
    krow = jnp.broadcast_to(kh[None, :, None, None], (1, len(k1), 1, c))
    p = (pad[0], pad[1] + up - 1)  # see _depthwise_conv: trailing zero-insert
    x = jax.lax.conv_general_dilated(
        x, kcol, window_strides=(down, 1), padding=(p, (0, 0)),
        lhs_dilation=(up, 1), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return jax.lax.conv_general_dilated(
        x, krow, window_strides=(1, down), padding=((0, 0), p),
        lhs_dilation=(1, up), dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


# Separable FIR runs two rank-1 passes (less compute, 2x the HBM round
# trips); the dense 2-D depthwise conv reads/writes the activations once.
# On TPU the resampling ops are memory-bound, so dense is the default;
# flip for debugging with USE_TPU_FIR_SEPARABLE=1.
_SEPARABLE = os.environ.get("USE_TPU_FIR_SEPARABLE", "0") == "1"
# Alternative strided-slice formulation of the factor-2 4-tap path.
# Measured on v5e inside ncsnpplarge it LOSES to the depthwise conv path
# (XLA fuses the conv into its space-to-batch pipeline and fuses GroupNorm
# statistics into the convolutions; the sliced path breaks those fusions:
# 104 ms vs 91 ms per forward) — kept behind a flag for experimentation.
_SLICED = os.environ.get("USE_TPU_FIR_SLICED", "0") == "1"


def _down2_4tap_axis(x: jnp.ndarray, k4, axis: int) -> jnp.ndarray:
    """Stride-2 4-tap FIR along `axis`: y[i] = sum_j k[j] x(2i + j - 1).

    Implemented as 4 strided slices of the once-padded input + weighted
    sum — XLA fuses this into a single output-sized vector loop.
    """
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 2)
    xp = jnp.pad(x, pad)
    n_out = x.shape[axis] // 2

    def sl(off):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(off, off + 2 * n_out, 2)
        return xp[tuple(idx)]

    acc = sl(0) * k4[0]
    for j in range(1, 4):
        acc = acc + sl(j) * k4[j]
    return acc


def _up2_4tap_axis(x: jnp.ndarray, k4, axis: int) -> jnp.ndarray:
    """2x zero-insert 4-tap FIR along `axis` (gain folded into k4).

    Even/odd output phases are two 2-tap weighted sums of neighbouring
    samples, interleaved by stack+reshape:
      y[2i]   = k[1] x[i]   + k[3] x[i-1]
      y[2i+1] = k[0] x[i+1] + k[2] x[i]
    """
    pad = [(0, 0)] * x.ndim
    pad[axis] = (1, 1)
    xp = jnp.pad(x, pad)
    n = x.shape[axis]

    def sl(off):
        idx = [slice(None)] * x.ndim
        idx[axis] = slice(off, off + n)
        return xp[tuple(idx)]

    even = sl(1) * k4[1] + sl(0) * k4[3]
    odd = sl(2) * k4[0] + sl(1) * k4[2]
    y = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return y.reshape(shape)


@functools.partial(jax.jit, static_argnames=("k", "factor", "gain"))
def upsample_2d(
    x: jnp.ndarray, k: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0), factor: int = 2, gain: float = 1.0
) -> jnp.ndarray:
    """FIR 2x upsampling of [B, H, W, C] (up_or_down_sampling.py:202-232)."""
    p = len(k) - factor
    pad = ((p + 1) // 2 + factor - 1, p // 2)
    if _SLICED and factor == 2 and len(k) == 4:
        k1 = np.asarray(k, np.float32)
        k1 = k1 / k1.sum() * (np.sqrt(gain) * factor)
        k4 = tuple(jnp.asarray(v, x.dtype) for v in k1)
        return _up2_4tap_axis(_up2_4tap_axis(x, k4, 1), k4, 2)
    if _SEPARABLE:
        k1 = np.asarray(k, np.float32)
        k1 = k1 / k1.sum()
        k1 = k1 * (np.sqrt(gain) * factor)  # split over the two passes
        return _separable_fir(x, k1, factor, 1, pad)
    kern = setup_kernel(k) * (gain * factor ** 2)
    return upfirdn2d(x, kern, up=factor, pad=pad)


@functools.partial(jax.jit, static_argnames=("k", "factor", "gain"))
def downsample_2d(
    x: jnp.ndarray, k: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0), factor: int = 2, gain: float = 1.0
) -> jnp.ndarray:
    """FIR 2x downsampling of [B, H, W, C] (up_or_down_sampling.py:235-264)."""
    p = len(k) - factor
    pad = ((p + 1) // 2, p // 2)
    if _SLICED and factor == 2 and len(k) == 4:
        k1 = np.asarray(k, np.float32)
        k1 = k1 / k1.sum() * np.sqrt(gain)
        k4 = tuple(jnp.asarray(v, x.dtype) for v in k1)
        return _down2_4tap_axis(_down2_4tap_axis(x, k4, 1), k4, 2)
    if _SEPARABLE:
        k1 = np.asarray(k, np.float32)
        k1 = k1 / k1.sum()
        k1 = k1 * np.sqrt(gain)
        return _separable_fir(x, k1, 1, factor, pad)
    kern = setup_kernel(k) * gain
    return upfirdn2d(x, kern, down=factor, pad=pad)


def naive_upsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Nearest-neighbour upsample (up_or_down_sampling.py:64-68)."""
    b, h, w, c = x.shape
    x = x[:, :, None, :, None, :]
    x = jnp.broadcast_to(x, (b, h, factor, w, factor, c))
    return x.reshape(b, h * factor, w * factor, c)


def naive_downsample_2d(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """Average-pool downsample (up_or_down_sampling.py:71-74)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    return jnp.mean(x, axis=(2, 4))


def upsample_conv_2d(
    x: jnp.ndarray,
    w: jnp.ndarray,  # HWIO [kh, kw, in, out]
    k: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0),
    factor: int = 2,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Fused upsample + conv (up_or_down_sampling.py:77-149).

    conv_transpose(stride=factor) followed by FIR smoothing. Used by the
    StyleGAN2-style Conv2d(up=True) layer.
    """
    assert w.shape[0] == w.shape[1]
    convh = w.shape[0]
    kern = setup_kernel(k) * (gain * (factor ** 2))
    p = (kern.shape[0] - factor) - (convh - 1)

    # conv_transpose with VALID padding == lax.conv_transpose
    x = jax.lax.conv_transpose(
        x, w, strides=(factor, factor), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return upfirdn2d(x, kern, pad=((p + 1) // 2 + factor - 1, p // 2 + 1))


def conv_downsample_2d(
    x: jnp.ndarray,
    w: jnp.ndarray,  # HWIO
    k: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0),
    factor: int = 2,
    gain: float = 1.0,
) -> jnp.ndarray:
    """Fused FIR + strided conv (up_or_down_sampling.py:152-185)."""
    assert w.shape[0] == w.shape[1]
    convh = w.shape[0]
    kern = setup_kernel(k) * gain
    p = (kern.shape[0] - factor) + (convh - 1)
    x = upfirdn2d(x, kern, pad=((p + 1) // 2, p // 2))
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(factor, factor), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
