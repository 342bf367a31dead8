"""Dynamic int8 quantized convolution for TPU MXU serving.

The v5e MXU runs int8 at ~2x its bf16 rate (measured 215 vs 121 TFLOP/s on
the ncsnpplarge mid-level conv shape). This module provides a drop-in
``QConv`` with the exact flax ``nn.Conv`` param tree ('kernel' HWIO +
'bias'), quantizing dynamically per call:

- activations: symmetric per-*sample* scales (max-abs / 127). Convolution
  never mixes the batch axis, so a per-sample scale factors out exactly:
  ``conv(q_x * s_x[n], q_w * s_w[o]) = conv(q_x, q_w) * s_x[n] * s_w[o]``.
- weights: symmetric per-output-channel scales.

This is inference-only machinery (no custom VJP; the surrounding model
only enables it on the serving path). Quality is validated by the
int8-vs-bf16 sampler-deviation test (tests/test_qconv.py) — on the NCSN++
blocks every quantized conv input is freshly GroupNorm-ed, which keeps
per-sample dynamic ranges tight.

The reference has no analog (it serves fp32/fp16 CUDA); this exists purely
to push the TPU MXU past the bf16 roofline.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

Dtype = Any


def quantize_per_sample(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[B, ..., C] -> (int8 values, fp32 scales [B]); symmetric max-abs."""
    red_axes = tuple(range(1, x.ndim))
    s = jnp.max(jnp.abs(x), axis=red_axes).astype(jnp.float32) / 127.0
    s = jnp.maximum(s, 1e-12)
    sb = s.reshape((-1,) + (1,) * (x.ndim - 1))
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / sb), -127.0, 127.0
    ).astype(jnp.int8)
    return q, s


def quantize_weight_per_cout(w: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO kernel -> (int8 kernel, fp32 per-output-channel scales [O])."""
    red_axes = tuple(range(w.ndim - 1))
    s = jnp.max(jnp.abs(w), axis=red_axes).astype(jnp.float32) / 127.0
    s = jnp.maximum(s, 1e-12)
    q = jnp.clip(
        jnp.round(w.astype(jnp.float32) / s), -127.0, 127.0
    ).astype(jnp.int8)
    return q, s


def qconv2d(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    strides: Tuple[int, int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
    kernel_dilation: Tuple[int, int] = (1, 1),
    out_dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """int8 NHWC conv with dynamic scales; returns dequantized output."""
    qx, sx = quantize_per_sample(x)
    qw, sw = quantize_weight_per_cout(kernel)
    y = lax.conv_general_dilated(
        qx, qw, window_strides=strides, padding=padding,
        rhs_dilation=kernel_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = sx.reshape(-1, 1, 1, 1) * sw.reshape(1, 1, 1, -1)
    return (y.astype(jnp.float32) * scale).astype(out_dtype)


def qconv2d_prequant(
    qx: jnp.ndarray,
    in_scale: jnp.ndarray,
    kernel: jnp.ndarray,
    *,
    strides: Tuple[int, int] = (1, 1),
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME",
    kernel_dilation: Tuple[int, int] = (1, 1),
    out_dtype: Dtype = jnp.float32,
) -> jnp.ndarray:
    """int8 conv on an already-quantized activation.

    ``qx`` is int8; ``in_scale`` is the fp32 quantization scale the producer
    used — a scalar, or PER-INPUT-CHANNEL [Ci] (GroupNormAct's k-sigma
    analytic scales). Per-channel input scales cannot be dequantized after
    the conv, but they fold into the weight quantization exactly:
    conv(q*u, w) = conv(q, w*u_broadcast). This is the zero-overhead serving
    path: the producer fused the quantize, the conv reads int8 (half the HBM
    traffic of bf16), the MXU runs at 2x, and XLA fuses the dequant multiply
    into the conv output (measured on v5e)."""
    assert qx.dtype == jnp.int8, qx.dtype
    in_scale = jnp.asarray(in_scale, jnp.float32)
    if in_scale.ndim == 1:  # per-input-channel: fold into the kernel (HWIO)
        kernel_eff = kernel.astype(jnp.float32) * in_scale[None, None, :, None]
        post = None
    else:  # scalar (or per-sample broadcastable): dequant after the conv
        kernel_eff = kernel.astype(jnp.float32)
        post = in_scale
    qw, sw = quantize_weight_per_cout(kernel_eff)
    y = lax.conv_general_dilated(
        qx, qw, window_strides=strides, padding=padding,
        rhs_dilation=kernel_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    scale = sw.reshape(1, 1, 1, -1)
    if post is not None:
        scale = scale * post
    return (y.astype(jnp.float32) * scale).astype(out_dtype)


def quantize_with_scale(x: jnp.ndarray, s: jnp.ndarray) -> jnp.ndarray:
    """Symmetric int8 quantization with a given fp32 scale (clips outliers)."""
    return jnp.clip(
        jnp.round(x.astype(jnp.float32) / s), -127.0, 127.0
    ).astype(jnp.int8)


class QConv(nn.Module):
    """Drop-in for ``nn.Conv`` (NHWC, HWIO) running the MXU in int8.

    Param tree matches ``nn.Conv`` exactly ('kernel' [kh, kw, Ci, Co],
    'bias' [Co]) so bf16/int8 serving share checkpoints unchanged.
    Supports the subset of nn.Conv used by NCSN++ (stride, int or explicit
    padding, kernel dilation, optional bias).

    Arithmetic-intensity gate: quantization pays ~3 extra elementwise/
    reduce passes over the activation (max-abs, round/clamp/convert,
    dequant) that XLA cannot fuse into the convolution. The MXU time an
    int8 conv saves is ~kh*kw*min(Ci,Co) FLOPs per element / peak, so on
    v5e (197 bf16 TFLOP/s vs ~820 GB/s HBM) the win flips positive around
    min(Ci, Co) >= ~190 for 3x3 kernels (measured: full-res C=128 layers
    LOSE ~25%, C=256 layers win). Convs below ``min_channels`` fall back
    to the exact bf16 path with identical params.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, int, Sequence[Tuple[int, int]]] = "SAME"
    kernel_dilation: Tuple[int, int] = (1, 1)
    use_bias: bool = True
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Dtype = jnp.float32
    min_channels: int = 192

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, prequant_scale: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel", self.kernel_init, (kh, kw, x.shape[-1], self.features)
        )
        pad = self.padding
        if isinstance(pad, int):
            pad = [(pad, pad), (pad, pad)]
        if prequant_scale is not None:
            # producer already quantized (e.g. GroupNormAct(quant='out')):
            # zero-overhead int8 path, no gate needed.
            y = qconv2d_prequant(
                x, prequant_scale, kernel, strides=self.strides, padding=pad,
                kernel_dilation=self.kernel_dilation, out_dtype=self.dtype,
            )
            if self.use_bias:
                bias = self.param("bias", self.bias_init, (self.features,))
                y = y + bias.astype(self.dtype)
            return y
        # 1x1 kernels have 9x less reuse per element; require 3x3-equivalent
        # intensity (min_channels * 9 / (kh*kw)) before quantizing.
        eff_min = self.min_channels * 9 // max(kh * kw, 1)
        if min(x.shape[-1], self.features) >= eff_min:
            y = qconv2d(
                x, kernel, strides=self.strides, padding=pad,
                kernel_dilation=self.kernel_dilation, out_dtype=self.dtype,
            )
        else:
            y = lax.conv_general_dilated(
                x.astype(self.dtype), kernel.astype(self.dtype),
                window_strides=self.strides, padding=pad,
                rhs_dilation=self.kernel_dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y
