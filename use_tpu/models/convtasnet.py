"""Conv-TasNet: time-domain encoder / TCN-mask / decoder backbone.

Re-implementation of the reference's alternative time-domain backbone
(reference: src/models/components/sgmse/backbones/convtasnet.py:14-112 +
convtasnet_utils/utils.py): strided conv encoder, dilated TCN producing a
sigmoid mask over the learned basis, transposed-conv decoder with
overlap-add. Non-causal by default (gLN); causal mode uses cumulative layer
norm.

Layout: waveforms [B, L]; encoder features [B, T, N].
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from use_tpu.models.gan.csmgan import CumLN1d
from use_tpu.models.registry import BackboneRegistry


class _Norm(nn.Module):
    """gLN (GroupNorm(1) over C+T) or causal CumLN."""

    causal: bool

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.causal:
            return CumLN1d()(x)
        return nn.GroupNorm(num_groups=1, epsilon=1e-8)(x)


class DepthConv1d(nn.Module):
    """(convtasnet_utils/utils.py DepthConv1d)."""

    input_channel: int
    hidden_channel: int
    kernel: int = 3
    dilation: int = 1
    causal: bool = False
    skip: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = nn.Conv(self.hidden_channel, (1,))(x)
        h = nn.PReLU()(h)
        h = _Norm(self.causal)(h)
        pad = (self.kernel - 1) * self.dilation
        if self.causal:
            h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        else:
            h = jnp.pad(h, ((0, 0), (pad // 2, pad - pad // 2), (0, 0)))
        h = nn.Conv(
            self.hidden_channel, (self.kernel,), kernel_dilation=(self.dilation,),
            feature_group_count=self.hidden_channel, padding="VALID",
        )(h)
        h = nn.PReLU()(h)
        h = _Norm(self.causal)(h)
        residual = nn.Conv(self.input_channel, (1,))(h)
        skip = nn.Conv(self.input_channel, (1,))(h) if self.skip else None
        return residual, skip


class TasTCN(nn.Module):
    """(convtasnet_utils/utils.py TCN)."""

    input_dim: int
    output_dim: int
    bn_dim: int
    hidden_dim: int
    layer: int = 8
    stack: int = 3
    kernel: int = 3
    causal: bool = False
    skip: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = _Norm(self.causal)(x)
        h = nn.Conv(self.bn_dim, (1,))(h)
        skip_sum = 0.0
        for s in range(self.stack):
            for i in range(self.layer):
                res, skip = DepthConv1d(
                    self.bn_dim, self.hidden_dim, self.kernel, dilation=2 ** i,
                    causal=self.causal, skip=self.skip, name=f"tcn_s{s}_l{i}",
                )(h)
                h = h + res
                if self.skip:
                    skip_sum = skip_sum + skip
        out = skip_sum if self.skip else h
        out = nn.PReLU()(out)
        return nn.Conv(self.output_dim, (1,))(out)


class ConvTasNet(nn.Module):
    """Waveform in [B, L] -> enhanced waveform [B, L]
    (convtasnet.py:14-112)."""

    fs: int = 16000
    win_ms: float = 2.0
    enc_dim: int = 256
    feature_dim: int = 128
    layer: int = 8
    stack: int = 3
    kernel: int = 3
    causal: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, time_cond=None, *, train: bool = False):
        win = int(self.fs * self.win_ms / 1000)
        stride = win // 2
        b, nsample = x.shape

        rest = (win - (stride + nsample % win) % win) % win
        x = jnp.pad(x, ((0, 0), (stride, rest + stride)))

        h = x[..., None]  # [B, L, 1]
        enc = nn.Conv(
            self.enc_dim, (win,), strides=(stride,), use_bias=False,
            padding="VALID", name="encoder",
        )(h)  # [B, T, N]

        mask = jax.nn.sigmoid(
            TasTCN(
                self.enc_dim, self.enc_dim, self.feature_dim, self.feature_dim * 4,
                self.layer, self.stack, self.kernel, causal=self.causal,
                name="TCN",
            )(enc)
        )
        masked = enc * mask

        out = nn.ConvTranspose(
            1, (win,), strides=(stride,), use_bias=False, padding="VALID",
            name="decoder",
        )(masked)[..., 0]
        # trim the aux/rest padding back to the input length
        return out[:, stride : stride + nsample]


BackboneRegistry.register("convtasnet")(ConvTasNet)
