"""NCSN++ building blocks in Flax (NHWC, TPU-native).

Re-designed from the behavior of the reference layers (reference:
src/models/components/sgmse/backbones/ncsnpp_utils/layerspp.py:30-314 and
layers.py:66-163,639-650): Gaussian-Fourier time embedding, NIN (1x1 dense
over channels), channelwise self-attention, FIR up/down sampling blocks and
BigGAN-style residual blocks.

Layout: all activations are ``[B, H(=freq), W(=frames), C]``. All parameter
shapes follow Flax conventions (conv kernels HWIO, dense kernels [in, out]);
the torch-checkpoint converter (use_tpu/engine/convert_torch.py) performs the
transpositions.

Submodule names intentionally match the reference's attribute names
(GroupNorm_0, Conv_0, Dense_0, NIN_0, ...) so converted checkpoints map 1:1.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from use_tpu.ops.upfirdn2d import (
    conv_downsample_2d,
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    upsample_2d,
    upsample_conv_2d,
)

Dtype = Any

# Experimental: one-pass Pallas GroupNorm statistics (use_tpu/ops/gn_stats.py).
# Measured neutral vs XLA's sibling-fused reduces on v5e at the shipping
# shapes — off by default, kept for larger configs where the two-pass read
# could dominate.
import os as _os

_PALLAS_GN = _os.environ.get("USE_TPU_PALLAS_GN", "0") == "1"


def get_act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation zoo (reference layers.py:29-41)."""
    if name == "elu":
        return jax.nn.elu
    if name == "relu":
        return jax.nn.relu
    if name == "lrelu":
        return lambda x: jax.nn.leaky_relu(x, negative_slope=0.2)
    if name == "swish":
        return jax.nn.silu
    raise NotImplementedError("activation function does not exist!")


def default_init(scale: float = 1.0):
    """DDPM initialization: variance_scaling(scale, fan_avg, uniform).

    Reference parity: layers.py:66-103 (itself 'ported from JAX').
    """
    scale = 1e-10 if scale == 0 else scale
    return nn.initializers.variance_scaling(scale, "fan_avg", "uniform")


def conv3x3(
    out_planes: int, stride: int = 1, bias: bool = True, dilation: int = 1,
    init_scale: float = 1.0, name: Optional[str] = None, dtype: Dtype = jnp.float32,
    quant: str = "none", quant_min_channels: int = 192,
) -> nn.Module:
    """3x3 conv with DDPM init (layers.py:146-162).

    quant='int8' swaps in the dynamically-quantized MXU path
    (use_tpu/ops/qconv.py) with the identical param tree."""
    if quant == "int8":
        from use_tpu.ops.qconv import QConv

        return QConv(
            out_planes, (3, 3), strides=(stride, stride), padding=dilation,
            kernel_dilation=(dilation, dilation), use_bias=bias,
            kernel_init=default_init(init_scale), bias_init=nn.initializers.zeros,
            name=name, dtype=dtype, min_channels=quant_min_channels,
        )
    return nn.Conv(
        out_planes, (3, 3), strides=(stride, stride), padding=dilation,
        kernel_dilation=(dilation, dilation), use_bias=bias,
        kernel_init=default_init(init_scale), bias_init=nn.initializers.zeros,
        name=name, dtype=dtype,
    )


def conv1x1(
    out_planes: int, stride: int = 1, bias: bool = True, init_scale: float = 1.0,
    name: Optional[str] = None, dtype: Dtype = jnp.float32,
    quant: str = "none", quant_min_channels: int = 192,
) -> nn.Module:
    """1x1 conv with DDPM init (layers.py:111-118).

    Deliberately the conv emitter, NOT a channel einsum: a dot_general here
    measures ~identical in isolation but cannot join XLA's convolution
    fusion pipelines, and swapping the 1x1 skips to einsum cost 76 ms per
    sampler step end-to-end on v5e (7.04 -> 5.87 audio-s/s) — see
    BASELINE.md negative results.
    """
    if quant == "int8":
        from use_tpu.ops.qconv import QConv

        return QConv(
            out_planes, (1, 1), strides=(stride, stride), padding=0, use_bias=bias,
            kernel_init=default_init(init_scale), bias_init=nn.initializers.zeros,
            name=name, dtype=dtype, min_channels=quant_min_channels,
        )
    return nn.Conv(
        out_planes, (1, 1), strides=(stride, stride), padding=0, use_bias=bias,
        kernel_init=default_init(init_scale), bias_init=nn.initializers.zeros,
        name=name, dtype=dtype,
    )


class PallasQConv3x3(nn.Module):
    """3x3 conv with the GroupNorm apply + SiLU + int8 quantize fused into
    the Pallas operand read (ops/pallas_qconv.py::qconv3x3_fused).

    Param tree matches ``nn.Conv`` ('kernel' HWIO + 'bias') so bf16 and
    int8_pallas serving share checkpoints unchanged. Consumes the folded
    scale/shift/u from ``GroupNormAct(quant='fold')`` — the activation is
    hard-wired to SiLU (the NCSN++ nonlinearity); serving-only."""

    features: int
    init_scale: float = 1.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, gn_scale, gn_shift, u):
        from use_tpu.ops.pallas_qconv import qconv3x3_fused

        kernel = self.param(
            "kernel", default_init(self.init_scale),
            (3, 3, x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return qconv3x3_fused(
            x, kernel, u, gn_scale=gn_scale, gn_shift=gn_shift, act=True,
            bias=bias, out_dtype=self.dtype,
        )


def group_norm(channels: int, name: Optional[str] = None) -> nn.GroupNorm:
    """GroupNorm(min(C//4, 32), eps=1e-6) as used across NCSN++."""
    return nn.GroupNorm(
        num_groups=min(max(channels // 4, 1), 32), epsilon=1e-6, name=name,
        dtype=jnp.float32,
    )


class GroupNormAct(nn.Module):
    """GroupNorm fused with an optional activation, in scale/shift form.

    Numerically the same normalization as ``group_norm`` (fp32 statistics,
    one-pass E[x^2]-E[x]^2 variance like Flax), but restructured for HBM
    bandwidth: the huge-activation passes are (1) one fused reduce producing
    mean/meansq per (batch, group) and (2) one elementwise ``x * a + b``
    (+activation) pass in the compute dtype. The per-channel ``a``/``b`` fold
    the fp32 statistics and the affine params, so the apply pass never
    upcasts the activations — profiled on v5e this replaces the fp32
    convert/reduce/multiply chains that cost ~35% of an ncsnpplarge forward.

    Param names/shapes ('scale', 'bias' of [C]) match ``nn.GroupNorm`` so
    converted torch checkpoints map unchanged.
    """

    channels: int
    act: Optional[Callable] = None
    out_dtype: Dtype = jnp.float32
    epsilon: float = 1e-6
    # int8 serving: 'out' -> return (int8 activation, fp32 scale) with the
    # quantize fused into the apply pass (it is the pass's only consumer, so
    # XLA emits ONE read of x writing int8 — half the bf16 write traffic and
    # no separate max-abs/round passes). 'scale' -> return (bf16/f32 y,
    # scale) for callers that resample between the norm and the conv.
    # The scale is ANALYTIC, not data-dependent: post-GN values are
    # zero-mean unit-variance per group, so per channel y_c = gamma_c*xhat +
    # beta_c is bounded by |beta_c| + k*|gamma_c| for |xhat| <= k sigma;
    # s = max_c(|beta_c| + k|gamma_c|)/127 clips only >k-sigma outliers
    # (k=8 default). The activation (|silu(y)| <= |y|) preserves the bound.
    quant: str = "none"  # 'none' | 'out' | 'scale' | 'fold'
    quant_k: float = 6.0

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        c = self.channels
        assert x.shape[-1] == c, (x.shape, c)
        groups = min(max(c // 4, 1), 32)
        cg = c // groups
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))

        spatial = x.shape[1:-1]
        b = x.shape[0]
        xg = x.reshape(b, -1, groups, cg)
        # Two reduces reading the compute-dtype tensor directly, both with
        # fp32 accumulation. The square runs in the compute dtype so the two
        # reduce inputs share the raw activation as their only common
        # producer — XLA sibling-fuses them into one pass over HBM. Any
        # formulation that converts x to f32 first (even via two separate
        # astype calls — CSE re-merges them) makes XLA *materialize* a
        # full-size f32 copy of the activation between layers: 2x HBM
        # traffic, 3.2 GB per copy on the full-resolution tensors at
        # batch 8 / 10 s. bf16 squaring costs ~2^-9 relative error on E[x^2],
        # irrelevant next to the bf16 activations themselves; in fp32 mode
        # (training / parity tests) this path is exact.
        if _PALLAS_GN:
            from use_tpu.ops.gn_stats import group_mean_meansq, pallas_ok

            x3 = x.reshape(b, -1, c)
            if pallas_ok(x3):
                mean, meansq = group_mean_meansq(x3, groups)
            else:
                mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
                meansq = jnp.mean(jnp.square(xg), axis=(1, 3), dtype=jnp.float32)
        else:
            mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)  # [B, G]
            meansq = jnp.mean(jnp.square(xg), axis=(1, 3), dtype=jnp.float32)
        # E[x^2]-E[x]^2 can come out slightly negative under catastrophic
        # cancellation (large-mean, tiny-variance channels) — torch's
        # GroupNorm can't; clamp so rsqrt never sees a negative.
        var = jnp.maximum(meansq - jnp.square(mean), 0.0)
        inv = jax.lax.rsqrt(var + self.epsilon)  # [B, G]

        # fold stats + affine into per-(batch, channel) scale/shift
        a = inv[:, :, None] * scale.reshape(groups, cg)[None]  # [B, G, cg]
        off = bias.reshape(groups, cg)[None] - mean[:, :, None] * a
        if self.quant == "fold":
            # Return the folded per-(batch, channel) scale/shift WITHOUT
            # applying, plus the analytic k-sigma quant scale — consumed by
            # PallasQConv3x3, which fuses apply+act+quantize into the conv's
            # operand read (ops/pallas_qconv.py). No apply pass runs here.
            u = (
                jnp.abs(bias) + self.quant_k * jnp.abs(scale)
            ).astype(jnp.float32) / 127.0 + 1e-12
            return (
                a.reshape(b, c).astype(jnp.float32),
                off.reshape(b, c).astype(jnp.float32),
                u,
            )

        a = a.reshape(b, *(1,) * len(spatial), c).astype(self.out_dtype)
        off = off.reshape(b, *(1,) * len(spatial), c).astype(self.out_dtype)

        y = x.astype(self.out_dtype) * a + off
        if self.act is not None:
            y = self.act(y)
        if self.quant == "none":
            return y
        # PER-CHANNEL scales [C]: each channel uses its own k-sigma range.
        # A per-channel input scale cannot be dequantized after a conv, but
        # it CAN be folded into the conv's weight quantization exactly
        # (w'_c = w_c * u_c) because u is a static function of the norm
        # params — see qconv2d_prequant(in_scale=...).
        u = (
            jnp.abs(bias) + self.quant_k * jnp.abs(scale)
        ).astype(jnp.float32) / 127.0 + 1e-12
        if self.quant == "scale":
            return y, u
        q = jnp.clip(
            jnp.round(y.astype(jnp.float32) / u), -127.0, 127.0
        ).astype(jnp.int8)
        return q, u


class GaussianFourierProjection(nn.Module):
    """Gaussian Fourier features for (log-)noise levels (layerspp.py:30-39).

    W is a frozen random projection; it lives in 'params' so checkpoint
    conversion is uniform, and the optimizer masks it out of updates
    (see use_tpu/engine/optim.py).
    """

    embedding_size: int = 256
    scale: float = 16.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "W",
            lambda key, shape: jax.random.normal(key, shape) * self.scale,
            (self.embedding_size,),
        )
        w = jax.lax.stop_gradient(w)
        x_proj = x[:, None] * w[None, :] * 2 * np.pi
        return jnp.concatenate([jnp.sin(x_proj), jnp.cos(x_proj)], axis=-1)


class NIN(nn.Module):
    """1x1 'network-in-network' dense over the channel axis (layers.py:639-650)."""

    num_units: int
    init_scale: float = 0.1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_dim = x.shape[-1]
        w = self.param("W", default_init(self.init_scale), (in_dim, self.num_units))
        b = self.param("b", nn.initializers.zeros, (self.num_units,))
        return (
            jnp.einsum("...c,cd->...d", x.astype(self.dtype), w.astype(self.dtype))
            + b.astype(self.dtype)
        )


class Combine(nn.Module):
    """Combine a skip pyramid with features (layerspp.py:42-57)."""

    dim2: int
    method: str = "cat"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        h = conv1x1(self.dim2, name="Conv_0", dtype=self.dtype)(x)
        if self.method == "cat":
            return jnp.concatenate([h, y], axis=-1)
        if self.method == "sum":
            return h + y
        raise ValueError(f"Method {self.method} not recognized.")


class AttnBlockpp(nn.Module):
    """Channel-wise self-attention over the full F x T grid (layerspp.py:60-93).

    Computed as two batched matmuls over the flattened spatial axis — a pure
    MXU workload: [B, HW, C] @ [B, C, HW] -> softmax -> @ [B, HW, C].
    """

    skip_rescale: bool = False
    init_scale: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        hid = GroupNormAct(c, act=None, out_dtype=self.dtype, name="GroupNorm_0")(x)
        q = NIN(c, name="NIN_0", dtype=self.dtype)(hid).reshape(b, h * w, c)
        k = NIN(c, name="NIN_1", dtype=self.dtype)(hid).reshape(b, h * w, c)
        v = NIN(c, name="NIN_2", dtype=self.dtype)(hid).reshape(b, h * w, c)

        logits = jnp.einsum(
            "bqc,bkc->bqk", q, k, preferred_element_type=jnp.float32
        ) * (int(c) ** (-0.5))
        attn = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("bqk,bkc->bqc", attn, v).reshape(b, h, w, c)
        out = NIN(c, init_scale=self.init_scale, name="NIN_3", dtype=self.dtype)(out)
        out = out.astype(x.dtype)
        if not self.skip_rescale:
            return x + out
        return (x + out) * float(1.0 / np.sqrt(2.0))


class Upsample(nn.Module):
    """FIR or nearest 2x upsampling, optionally fused with a conv
    (layerspp.py:96-133)."""

    in_ch: Optional[int] = None
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        out_ch = self.out_ch if self.out_ch is not None else c
        if not self.fir:
            hh = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
            if self.with_conv:
                hh = conv3x3(out_ch, name="Conv_0")(hh)
            return hh
        if not self.with_conv:
            return upsample_2d(x, self.fir_kernel, factor=2)
        kernel = self.param("Conv2d_0_weight", default_init(), (3, 3, c, out_ch))
        bias = self.param("Conv2d_0_bias", nn.initializers.zeros, (out_ch,))
        y = upsample_conv_2d(x, kernel, k=self.fir_kernel)
        return y + bias.reshape(1, 1, 1, -1)


class Downsample(nn.Module):
    """FIR or average-pool 2x downsampling (layerspp.py:136-175)."""

    in_ch: Optional[int] = None
    out_ch: Optional[int] = None
    with_conv: bool = False
    fir: bool = False
    fir_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        out_ch = self.out_ch if self.out_ch is not None else c
        if not self.fir:
            if self.with_conv:
                x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
                return nn.Conv(
                    out_ch, (3, 3), strides=(2, 2), padding="VALID",
                    kernel_init=default_init(), bias_init=nn.initializers.zeros,
                    name="Conv_0",
                )(x)
            return nn.avg_pool(x, (2, 2), strides=(2, 2))
        if not self.with_conv:
            return downsample_2d(x, self.fir_kernel, factor=2)
        kernel = self.param("Conv2d_0_weight", default_init(), (3, 3, c, out_ch))
        bias = self.param("Conv2d_0_bias", nn.initializers.zeros, (out_ch,))
        y = conv_downsample_2d(x, kernel, k=self.fir_kernel)
        return y + bias.reshape(1, 1, 1, -1)


class ResnetBlockDDPMpp(nn.Module):
    """DDPM residual block (layerspp.py:178-234)."""

    act: Callable
    out_ch: Optional[int] = None
    conv_shortcut: bool = False
    dropout: float = 0.1
    skip_rescale: bool = False
    init_scale: float = 0.0
    temb_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    quant: str = "none"
    quant_min_channels: int = 128
    quant_k: float = 6.0

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch if self.out_ch is not None else in_ch
        # int8 serving path: see ResnetBlockBigGANpp
        q0 = (self.quant == "int8" and not train
              and min(in_ch, out_ch) >= self.quant_min_channels)
        q1 = (self.quant == "int8" and not train
              and out_ch >= self.quant_min_channels)

        gn0 = GroupNormAct(in_ch, act=self.act, out_dtype=self.dtype,
                           name="GroupNorm_0", quant="out" if q0 else "none",
                           quant_k=self.quant_k)
        conv0 = conv3x3(out_ch, name="Conv_0", dtype=self.dtype,
                        quant="int8" if q0 else "none")
        if q0:
            hq, s0 = gn0(x)
            h = conv0(hq, prequant_scale=s0)
        else:
            h = conv0(gn0(x))
        h = checkpoint_name(h, "ncsnpp_conv_out")
        if temb is not None:
            h += nn.Dense(
                out_ch, kernel_init=default_init(), bias_init=nn.initializers.zeros,
                name="Dense_0", dtype=self.dtype,
            )(self.act(temb))[:, None, None, :]
        gn1 = GroupNormAct(out_ch, act=self.act, out_dtype=self.dtype,
                           name="GroupNorm_1", quant="out" if q1 else "none",
                           quant_k=self.quant_k)
        conv1 = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                        dtype=self.dtype, quant="int8" if q1 else "none")
        if q1:
            hq, s1 = gn1(h)
            h = conv1(hq, prequant_scale=s1)
        else:
            h = gn1(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = conv1(h)
        h = checkpoint_name(h, "ncsnpp_conv_out")
        if in_ch != out_ch:
            if self.conv_shortcut:
                x = conv3x3(out_ch, name="Conv_2", dtype=self.dtype)(x)
            else:
                x = NIN(out_ch, name="NIN_0", dtype=self.dtype)(x)
        x = x.astype(h.dtype)
        if not self.skip_rescale:
            return x + h
        return (x + h) * float(1.0 / np.sqrt(2.0))


class ResnetBlockBigGANpp(nn.Module):
    """BigGAN residual block with optional FIR up/down (layerspp.py:237-314)."""

    act: Callable
    out_ch: Optional[int] = None
    up: bool = False
    down: bool = False
    dropout: float = 0.1
    fir: bool = False
    fir_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)
    skip_rescale: bool = True
    init_scale: float = 0.0
    temb_dim: Optional[int] = None
    dtype: Dtype = jnp.float32
    quant: str = "none"
    quant_min_channels: int = 128
    quant_k: float = 6.0

    @nn.compact
    def __call__(self, x, temb=None, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = self.out_ch if self.out_ch is not None else in_ch
        # int8 serving (never in training: jnp.round has zero gradient).
        # The quantize is fused into the GroupNorm apply pass with an
        # analytic scale (GroupNormAct docstring) — zero extra HBM passes —
        # so the gate only needs the conv to be MXU-bound at all.
        q0 = (self.quant == "int8" and not train
              and min(in_ch, out_ch) >= self.quant_min_channels)
        q1 = (self.quant == "int8" and not train
              and out_ch >= self.quant_min_channels)
        # 'int8_pallas': the Pallas kernel fuses GN-apply+SiLU+quantize into
        # the conv's operand read (no normalized tensor in HBM at all,
        # BASELINE.md:113-117). SiLU is hard-wired in the kernel; resampling
        # blocks keep conv0 on the bf16 path (the FIR sits between the norm
        # and the conv).
        silu = self.act in (jax.nn.silu, jax.nn.swish)
        qp0 = (self.quant == "int8_pallas" and not train and silu
               and not (self.up or self.down)
               and min(in_ch, out_ch) >= self.quant_min_channels)
        qp1 = (self.quant == "int8_pallas" and not train and silu
               and out_ch >= self.quant_min_channels)

        gn0 = GroupNormAct(
            in_ch, act=self.act, out_dtype=self.dtype, name="GroupNorm_0",
            quant=("fold" if qp0 else
                   ("scale" if (self.up or self.down) else "out") if q0
                   else "none"),
            quant_k=self.quant_k,
        )
        s0 = fold0 = None
        if qp0:
            fold0 = gn0(x)  # (scale [B,C], shift [B,C], u [C]); h stays raw
            h = x
        elif q0:
            h, s0 = gn0(x)  # int8 (or bf16 y + scale when resampling)
        else:
            h = gn0(x)

        if self.up:
            if self.fir:
                h = upsample_2d(h, self.fir_kernel, factor=2)
                x = upsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_upsample_2d(h, factor=2)
                x = naive_upsample_2d(x, factor=2)
        elif self.down:
            if self.fir:
                h = downsample_2d(h, self.fir_kernel, factor=2)
                x = downsample_2d(x, self.fir_kernel, factor=2)
            else:
                h = naive_downsample_2d(h, factor=2)
                x = naive_downsample_2d(x, factor=2)
        if q0 and (self.up or self.down):
            # the normalized FIR kernel has unit DC gain per polyphase leg,
            # so the pre-resample bound still holds; fuses into the FIR pass
            from use_tpu.ops.qconv import quantize_with_scale

            h = quantize_with_scale(h, s0)

        if qp0:
            h = PallasQConv3x3(out_ch, name="Conv_0", dtype=self.dtype)(
                h, *fold0
            )
        else:
            conv0 = conv3x3(out_ch, name="Conv_0", dtype=self.dtype,
                            quant="int8" if q0 else "none")
            h = conv0(h, prequant_scale=s0) if q0 else conv0(h)
        # identity tag for the selective remat policy (ncsnpp.py remat_policy
        # 'conv_outs'): backward saves conv outputs, recomputes only the
        # cheap normalization/activation/FIR passes
        h = checkpoint_name(h, "ncsnpp_conv_out")
        if temb is not None:
            h += nn.Dense(
                out_ch, kernel_init=default_init(), bias_init=nn.initializers.zeros,
                name="Dense_0", dtype=self.dtype,
            )(self.act(temb))[:, None, None, :]
        gn1 = GroupNormAct(
            out_ch, act=self.act, out_dtype=self.dtype, name="GroupNorm_1",
            quant="fold" if qp1 else ("out" if q1 else "none"),
            quant_k=self.quant_k,
        )
        if qp1:
            # dropout is deterministic-identity at inference; apply+act+
            # quantize fuse into the Pallas conv's operand read
            fold1 = gn1(h)
            h = PallasQConv3x3(
                out_ch, init_scale=self.init_scale, name="Conv_1",
                dtype=self.dtype,
            )(h, *fold1)
        elif q1:
            # dropout is deterministic-identity at inference (quant never
            # runs in training), so it drops out of the quantized path
            conv1 = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                            dtype=self.dtype, quant="int8")
            hq, s1 = gn1(h)
            h = conv1(hq, prequant_scale=s1)
        else:
            conv1 = conv3x3(out_ch, init_scale=self.init_scale, name="Conv_1",
                            dtype=self.dtype)
            h = gn1(h)
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
            h = conv1(h)
        h = checkpoint_name(h, "ncsnpp_conv_out")

        if in_ch != out_ch or self.up or self.down:
            # 1x1 skip conv stays bf16: memory-bound, and its input is the
            # raw (un-normalized) multi-consumer x where the fused-quantize
            # trick does not apply
            x = conv1x1(out_ch, name="Conv_2", dtype=self.dtype)(x)

        x = x.astype(h.dtype)
        if not self.skip_rescale:
            return x + h
        return (x + h) * float(1.0 / np.sqrt(2.0))
