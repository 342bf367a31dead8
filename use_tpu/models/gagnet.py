"""GaGNet: glance (magnitude) + gaze (complex) two-stage enhancement net.

Re-implementation of the reference's alternative backbone (reference:
src/models/components/sgmse/backbones/gagnet.py:13-851): a U^2 (or plain
U-Net) encoder over [B, T, F, 2] spectra with gated convs, followed by q
GlanceGaze modules — each predicting a magnitude gain filter (glance) and a
complex residual (gaze) from squeezed causal TCN groups — and a final tanh
complex mask applied multiplicatively to the input spectrum.

Layout: [B, T, F, C] inside (time leading for causal padding); the backbone
interface consumes [B, F, T, 2] and returns [B, F, T, 1, 2] like NCSN++.
Note: transposed convs follow lax.conv_transpose (no kernel flip) — fresh
training orientation, not binary-compatible with torch deconv weights.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from use_tpu.models.registry import BackboneRegistry


class PReLUC(nn.Module):
    """Per-channel PReLU (torch nn.PReLU(c))."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        a = self.param("alpha", nn.initializers.constant(0.25), (x.shape[-1],))
        return jnp.where(x >= 0, x, a * x)


def instance_norm(x: jnp.ndarray, scale, bias, eps: float = 1e-5) -> jnp.ndarray:
    """InstanceNorm(affine=True) over the spatial axes of [B, *spatial, C]."""
    axes = tuple(range(1, x.ndim - 1))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


class NormSwitch(nn.Module):
    """IN with affine (gagnet.py:670-697); BN mapped to IN (batch-free)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return instance_norm(x, scale, bias)


class GateConv2d(nn.Module):
    """Causal gated conv: time pad (k_t-1) on the left (gagnet.py:613-646)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt = self.kernel_size[0]
        if kt > 1:
            x = jnp.pad(x, ((0, 0), (kt - 1, 0), (0, 0), (0, 0)))
        h = nn.Conv(
            self.features * 2, self.kernel_size, strides=self.strides, padding="VALID"
        )(x)
        out, g = jnp.split(h, 2, axis=-1)
        return out * jax.nn.sigmoid(g)


class Conv2dUnit(nn.Module):
    """conv (1,2)-strided + norm + PReLU (gagnet.py:574-590)."""

    k: Tuple[int, int]
    c: int

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.c, self.k, strides=(1, 2), padding="VALID")(x)
        return PReLUC()(NormSwitch()(x))


class Deconv2dUnit(nn.Module):
    """transposed conv (1,2) + norm + PReLU (gagnet.py:593-610)."""

    k: Tuple[int, int]
    c: int

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(self.c, self.k, strides=(1, 2), padding="VALID")(x)
        return PReLUC()(NormSwitch()(x))


class EnUnetModule(nn.Module):
    """Recursive intra-block U-Net over frequency (gagnet.py:517-571)."""

    cout: int
    k1: Tuple[int, int]
    k2: Tuple[int, int]
    intra_connect: str = "cat"
    scale: int = 1

    @nn.compact
    def __call__(self, x):
        x = GateConv2d(self.cout, self.k1, (1, 2))(x)
        x = PReLUC()(NormSwitch()(x))
        x_resi = x

        xs = []
        for i in range(self.scale):
            x = Conv2dUnit(self.k2, self.cout, name=f"enco{i}")(x)
            xs.append(x)
        for i in range(self.scale):
            if i == 0:
                x = Deconv2dUnit(self.k2, self.cout, name=f"deco{i}")(x)
            else:
                skip = xs[-(i + 1)]
                if self.intra_connect == "add":
                    x = x + skip
                else:
                    x = jnp.concatenate([x, skip], axis=-1)
                x = Deconv2dUnit(self.k2, self.cout, name=f"deco{i}")(x)
        return x_resi + x


class U2NetEncoder(nn.Module):
    """(gagnet.py:430-463)."""

    cin: int
    k1: Tuple[int, int]
    k2: Tuple[int, int]
    c: int
    intra_connect: str

    @nn.compact
    def __call__(self, x):
        x = EnUnetModule(self.c, (2, 5), self.k2, self.intra_connect, scale=4, name="u0")(x)
        x = EnUnetModule(self.c, self.k1, self.k2, self.intra_connect, scale=3, name="u1")(x)
        x = EnUnetModule(self.c, self.k1, self.k2, self.intra_connect, scale=2, name="u2")(x)
        x = EnUnetModule(self.c, self.k1, self.k2, self.intra_connect, scale=1, name="u3")(x)
        x = GateConv2d(64, self.k1, (1, 2), name="last_gate")(x)
        return PReLUC()(NormSwitch()(x))


class UNetEncoder(nn.Module):
    """(gagnet.py:466-515)."""

    cin: int
    k1: Tuple[int, int]
    c: int

    @nn.compact
    def __call__(self, x):
        specs = [((2, 5), self.c), (self.k1, self.c), (self.k1, self.c),
                 (self.k1, self.c), (self.k1, 64)]
        for i, (k, c) in enumerate(specs):
            x = GateConv2d(c, k, (1, 2), name=f"gate{i}")(x)
            x = PReLUC()(NormSwitch()(x))
        return x


class SqueezedTCM(nn.Module):
    """Squeezed causal dilated TCN block over [B, T, C] (gagnet.py:388-427)."""

    kd1: int
    cd1: int
    d_feat: int
    dilation: int
    causal: bool = True

    @nn.compact
    def __call__(self, x):
        resi = x
        h = nn.Conv(self.cd1, (1,), use_bias=False)(x)
        h = NormSwitch()(PReLUC()(h))
        pad = (self.kd1 - 1) * self.dilation
        if self.causal:
            h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        else:
            h = jnp.pad(h, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
        h = nn.Conv(
            self.cd1, (self.kd1,), kernel_dilation=(self.dilation,),
            padding="VALID", use_bias=False,
        )(h)
        h = NormSwitch()(PReLUC()(h))
        h = nn.Conv(self.d_feat, (1,), use_bias=False)(h)
        return h + resi


class SqueezedTCNGroup(nn.Module):
    kd1: int
    cd1: int
    d_feat: int
    dilas: Tuple[int, ...]
    causal: bool

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate(self.dilas):
            x = SqueezedTCM(self.kd1, self.cd1, self.d_feat, d, self.causal,
                            name=f"tcm{i}")(x)
        return x


class GlanceBlock(nn.Module):
    """Magnitude gain-filter head (gagnet.py:241-294)."""

    kd1: int
    cd1: int
    d_feat: int
    p: int
    dilas: Tuple[int, ...]
    freqs: int
    causal: bool
    acti_type: str = "sigmoid"

    @nn.compact
    def __call__(self, feat_x, pre_flat):
        """feat_x [B, T, C1]; pre_flat [B, T, 2F] -> gain [B, T, F]."""
        inpt = jnp.concatenate([feat_x, pre_flat], axis=-1)
        x = nn.Conv(self.d_feat, (1,), name="in_main")(inpt) * jax.nn.sigmoid(
            nn.Conv(self.d_feat, (1,), name="in_gate")(inpt)
        )
        for i in range(self.p):
            x = SqueezedTCNGroup(self.kd1, self.cd1, self.d_feat, self.dilas,
                                 self.causal, name=f"tcn{i}")(x)
        x = nn.Conv(self.freqs, (1,), name="linear_g")(x)
        acti = {"sigmoid": jax.nn.sigmoid, "tanh": jnp.tanh, "relu": jax.nn.relu}[
            self.acti_type
        ]
        return acti(x)


class GazeBlock(nn.Module):
    """Complex residual head (gagnet.py:297-358)."""

    kd1: int
    cd1: int
    d_feat: int
    p: int
    dilas: Tuple[int, ...]
    freqs: int
    causal: bool
    is_squeezed: bool = False

    @nn.compact
    def __call__(self, feat_x, pre_flat):
        inpt = jnp.concatenate([feat_x, pre_flat], axis=-1)
        x = nn.Conv(self.d_feat, (1,), name="in_main")(inpt) * jax.nn.sigmoid(
            nn.Conv(self.d_feat, (1,), name="in_gate")(inpt)
        )
        if not self.is_squeezed:
            xr = xi = x
            for i in range(self.p):
                xr = SqueezedTCNGroup(self.kd1, self.cd1, self.d_feat, self.dilas,
                                      self.causal, name=f"tcn_r{i}")(xr)
                xi = SqueezedTCNGroup(self.kd1, self.cd1, self.d_feat, self.dilas,
                                      self.causal, name=f"tcn_i{i}")(xi)
        else:
            for i in range(self.p):
                x = SqueezedTCNGroup(self.kd1, self.cd1, self.d_feat, self.dilas,
                                     self.causal, name=f"tcn_ri{i}")(x)
            xr = xi = x
        r = nn.Conv(self.freqs, (1,), name="linear_r")(xr)
        i_ = nn.Conv(self.freqs, (1,), name="linear_i")(xi)
        return jnp.stack([r, i_], axis=-1)  # [B, T, F, 2]


class GlanceGazeModule(nn.Module):
    """One GGM stage (gagnet.py:188-238)."""

    kd1: int
    cd1: int
    d_feat: int
    p: int
    dilas: Tuple[int, ...]
    freqs: int
    causal: bool
    is_squeezed: bool
    acti_type: str

    @nn.compact
    def __call__(self, feat_x, pre_x):
        """feat_x [B, T, C1]; pre_x [B, T, F, 2] -> [B, T, F, 2]."""
        b, t, f, _ = pre_x.shape
        pre_flat = pre_x.reshape(b, t, f * 2)
        gain = GlanceBlock(
            self.kd1, self.cd1, self.d_feat, self.p, self.dilas, self.freqs,
            self.causal, self.acti_type, name="glance",
        )(feat_x, pre_flat)
        resi = GazeBlock(
            self.kd1, self.cd1, self.d_feat, self.p, self.dilas, self.freqs,
            self.causal, self.is_squeezed, name="gaze",
        )(feat_x, pre_flat)
        mag = jnp.sqrt(jnp.sum(pre_x ** 2, axis=-1) + 1e-12)
        phase = jnp.arctan2(pre_x[..., 1], pre_x[..., 0])
        filtered = mag * gain
        coarse = jnp.stack(
            [filtered * jnp.cos(phase), filtered * jnp.sin(phase)], axis=-1
        )
        return coarse + resi


class GaGNet(nn.Module):
    """Full GaGNet; backbone interface [B, F, T, 2] -> [B, F, T, 1, 2]
    (gagnet.py:14-185)."""

    cin: int = 2
    k1: Tuple[int, int] = (2, 3)
    k2: Tuple[int, int] = (1, 3)
    c: int = 64
    kd1: int = 3
    cd1: int = 64
    d_feat: int = 256
    p: int = 2
    q: int = 3
    dilas: Tuple[int, ...] = (1, 2, 5, 9)
    fft_num: int = 320
    is_u2: bool = True
    causal: bool = True
    is_squeezed: bool = False
    acti_type: str = "sigmoid"
    intra_connect: str = "cat"
    norm_type: str = "IN"
    input_channels: int = 2  # backbone-registry compat (RI input)

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_cond=None, *, train: bool = False):
        b, f, t, _ = x.shape
        spec = jnp.transpose(x, (0, 2, 1, 3))  # [B, T, F, 2]
        padded = f % 2 == 0
        if padded:  # encoder needs odd F (forward:130-133)
            spec_in = jnp.pad(spec, ((0, 0), (0, 0), (0, 1), (0, 0)))
        else:
            spec_in = spec

        if self.is_u2:
            feat = U2NetEncoder(self.cin, self.k1, self.k2, self.c,
                                self.intra_connect, name="en")(spec_in)
        else:
            feat = UNetEncoder(self.cin, self.k1, self.c, name="en")(spec_in)
        bb, tt, ff, cc = feat.shape
        z = feat.reshape(bb, tt, ff * cc)  # [B, T, C1]

        freqs = spec_in.shape[2]
        pre = spec_in
        for i in range(self.q):
            pre = GlanceGazeModule(
                self.kd1, self.cd1, self.d_feat, self.p, self.dilas, freqs,
                self.causal, self.is_squeezed, self.acti_type, name=f"gag{i}",
            )(z, pre)

        if padded:
            pre = pre[:, :, :-1, :]
        mask = jnp.tanh(pre)  # [B, T, F, 2]
        # complex mask multiply: (mr + i mi)(xr + i xi)
        mr, mi = mask[..., 0], mask[..., 1]
        xr, xi = spec[..., 0], spec[..., 1]
        out = jnp.stack([mr * xr - mi * xi, mr * xi + mi * xr], axis=-1)
        out = jnp.transpose(out, (0, 2, 1, 3))  # [B, F, T, 2]
        return out[:, :, :, None, :]  # [B, F, T, D=1, 2]


def make_gagnet(**kwargs) -> GaGNet:
    known = set(GaGNet.__dataclass_fields__) if hasattr(GaGNet, "__dataclass_fields__") else None
    kwargs.pop("dnn_channels", None)
    return GaGNet(**kwargs)


BackboneRegistry.register("gagnet")(make_gagnet)
