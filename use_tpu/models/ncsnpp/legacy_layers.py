"""NCSNv1 / RefineNet legacy blocks in Flax (NHWC).

Behavioural port of the reference's legacy layer zoo (reference:
src/models/components/sgmse/backbones/ncsnpp_utils/layers.py:170-560):
CRP / RCU / MSF / Refine blocks, pool-fused convolutions and the NCSNv1
residual block. These are not used by the NCSN++ forward path (the
reference keeps them for its NCSNv1-style backbones) but are part of the
public layer surface.

Conditional variants take a `normalizer` factory (from
use_tpu.models.ncsnpp.normalization) and a class-index array `y`; the
unconditional classes pass `normalizer=None`.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from use_tpu.models.ncsnpp.layers import default_init

Act = Callable[[jnp.ndarray], jnp.ndarray]


def ncsn_conv3x3(out_planes: int, stride: int = 1, bias: bool = True,
                 dilation: int = 1, init_scale: float = 1.0,
                 name: Optional[str] = None) -> nn.Conv:
    """3x3 conv, NCSNv1 init (reference layers.py:121-143)."""
    return nn.Conv(
        out_planes, (3, 3), strides=(stride, stride), padding=dilation,
        kernel_dilation=(dilation, dilation), use_bias=bias,
        kernel_init=default_init(init_scale), bias_init=nn.initializers.zeros,
        name=name,
    )


def _pool5(x: jnp.ndarray, maxpool: bool) -> jnp.ndarray:
    """5x5 stride-1 max/avg pool, SAME padding (layers.py:177-180)."""
    if maxpool:
        return nn.max_pool(x, (5, 5), strides=(1, 1), padding="SAME")
    return nn.avg_pool(x, (5, 5), strides=(1, 1), padding="SAME")


class CRPBlock(nn.Module):
    """Chained residual pooling (layers.py:170-191)."""

    features: int
    n_stages: int
    act: Act = jax.nn.relu
    maxpool: bool = True
    normalizer: Optional[Callable[..., nn.Module]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        x = self.act(x)
        path = x
        for i in range(self.n_stages):
            if self.normalizer is not None:
                path = self.normalizer(name=f"norm_{i}")(path, y)
            # conditional CRP always avg-pools (layers.py:204)
            path = _pool5(path, self.maxpool and self.normalizer is None)
            path = ncsn_conv3x3(self.features, bias=False, name=f"conv_{i}")(path)
            x = path + x
        return x


class RCUBlock(nn.Module):
    """Residual conv unit chain (layers.py:220-246)."""

    features: int
    n_blocks: int
    n_stages: int
    act: Act = jax.nn.relu
    normalizer: Optional[Callable[..., nn.Module]] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        for i in range(self.n_blocks):
            residual = x
            for j in range(self.n_stages):
                if self.normalizer is not None:
                    x = self.normalizer(name=f"{i + 1}_{j + 1}_norm")(x, y)
                x = self.act(x)
                x = ncsn_conv3x3(
                    self.features, bias=False, name=f"{i + 1}_{j + 1}_conv"
                )(x)
            x = x + residual
        return x


def _bilinear_resize(x: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """align_corners=True bilinear (to match F.interpolate, layers.py:295)."""
    b, h, w, c = x.shape
    nh, nw = shape
    # align_corners: sample positions linspace(0, size-1, new)
    rows = jnp.linspace(0.0, h - 1.0, nh)
    cols = jnp.linspace(0.0, w - 1.0, nw)
    r0 = jnp.floor(rows).astype(jnp.int32)
    c0 = jnp.floor(cols).astype(jnp.int32)
    r1 = jnp.minimum(r0 + 1, h - 1)
    c1 = jnp.minimum(c0 + 1, w - 1)
    fr = (rows - r0)[None, :, None, None]
    fc = (cols - c0)[None, None, :, None]
    top = x[:, r0][:, :, c0] * (1 - fc) + x[:, r0][:, :, c1] * fc
    bot = x[:, r1][:, :, c0] * (1 - fc) + x[:, r1][:, :, c1] * fc
    return top * (1 - fr) + bot * fr


class MSFBlock(nn.Module):
    """Multi-scale fusion: per-input conv + bilinear resize + sum
    (layers.py:283-300)."""

    features: int
    n_inputs: int
    normalizer: Optional[Callable[..., nn.Module]] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], shape: Tuple[int, int],
                 y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        assert len(xs) == self.n_inputs
        out = None
        for i, x in enumerate(xs):
            h = x
            if self.normalizer is not None:
                h = self.normalizer(name=f"norm_{i}")(h, y)
            h = ncsn_conv3x3(self.features, bias=True, name=f"conv_{i}")(h)
            h = _bilinear_resize(h, shape)
            out = h if out is None else out + h
        return out


class RefineBlock(nn.Module):
    """RefineNet block: RCU adapters -> MSF -> CRP -> output RCU
    (layers.py:330-360)."""

    features: int
    in_planes: Tuple[int, ...]
    act: Act = jax.nn.relu
    start: bool = False
    end: bool = False
    maxpool: bool = True
    normalizer: Optional[Callable[..., nn.Module]] = None

    @nn.compact
    def __call__(self, xs: Sequence[jnp.ndarray], output_shape: Tuple[int, int],
                 y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        hs = [
            RCUBlock(p, 2, 2, self.act, self.normalizer, name=f"adapt_{i}")(x, y)
            for i, (x, p) in enumerate(zip(xs, self.in_planes))
        ]
        if len(xs) > 1:
            h = MSFBlock(self.features, len(xs), self.normalizer, name="msf")(
                hs, output_shape, y
            )
        else:
            h = hs[0]
        h = CRPBlock(
            self.features, 2, self.act, self.maxpool, self.normalizer, name="crp"
        )(h, y)
        return RCUBlock(
            self.features, 3 if self.end else 1, 2, self.act, self.normalizer,
            name="output",
        )(h, y)


def _mean_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Sum of the four 2x2 phases / 4 (layers.py:419-431)."""
    return (
        x[:, ::2, ::2] + x[:, 1::2, ::2] + x[:, ::2, 1::2] + x[:, 1::2, 1::2]
    ) / 4.0


class ConvMeanPool(nn.Module):
    """conv then 2x mean pool (layers.py:404-431)."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.adjust_padding:
            x = jnp.pad(x, ((0, 0), (1, 0), (1, 0), (0, 0)))
            pad = "VALID" if self.kernel_size == 3 else self.kernel_size // 2
        else:
            pad = self.kernel_size // 2
        h = nn.Conv(
            self.output_dim, (self.kernel_size, self.kernel_size), padding=pad,
            use_bias=self.biases, name="conv",
        )(x)
        return _mean_pool_2x(h)


class MeanPoolConv(nn.Module):
    """2x mean pool then conv (layers.py:434-454)."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(
            self.output_dim, (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2, use_bias=self.biases, name="conv",
        )(_mean_pool_2x(x))


class UpsampleConv(nn.Module):
    """4x channel-repeat + pixel-shuffle 2x + conv (layers.py:457-470)."""

    output_dim: int
    kernel_size: int = 3
    biases: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        # torch PixelShuffle of cat([x]*4) on NCHW == nearest 2x here
        up = jnp.broadcast_to(
            x[:, :, None, :, None, :], (b, h, 2, w, 2, c)
        ).reshape(b, 2 * h, 2 * w, c)
        return nn.Conv(
            self.output_dim, (self.kernel_size, self.kernel_size),
            padding=self.kernel_size // 2, use_bias=self.biases, name="conv",
        )(up)


class ResidualBlock(nn.Module):
    """NCSNv1 residual block with optional 'down' resample
    (layers.py:473-560); conditional when `normalizer` is given."""

    output_dim: int
    resample: Optional[str] = None
    act: Act = jax.nn.elu
    normalizer: Optional[Callable[..., nn.Module]] = None
    dilation: int = 1
    adjust_padding: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        input_dim = x.shape[-1]

        def norm(h, name):
            if self.normalizer is None:
                return h
            return self.normalizer(name=name)(h, y)

        h = norm(x, "normalize1")
        h = self.act(h)
        if self.resample == "down":
            if self.dilation > 1:
                h = ncsn_conv3x3(input_dim, dilation=self.dilation, name="conv1")(h)
                h = norm(h, "normalize2")
                h = self.act(h)
                h = ncsn_conv3x3(
                    self.output_dim, dilation=self.dilation, name="conv2"
                )(h)
                shortcut = ncsn_conv3x3(
                    self.output_dim, dilation=self.dilation, name="shortcut"
                )(x)
            else:
                h = ncsn_conv3x3(input_dim, name="conv1")(h)
                h = norm(h, "normalize2")
                h = self.act(h)
                h = ConvMeanPool(
                    self.output_dim, 3, adjust_padding=self.adjust_padding,
                    name="conv2",
                )(h)
                shortcut = ConvMeanPool(
                    self.output_dim, 1, adjust_padding=self.adjust_padding,
                    name="shortcut",
                )(x)
        elif self.resample is None:
            if self.dilation > 1:
                h = ncsn_conv3x3(self.output_dim, dilation=self.dilation, name="conv1")(h)
                h = norm(h, "normalize2")
                h = self.act(h)
                h = ncsn_conv3x3(
                    self.output_dim, dilation=self.dilation, name="conv2"
                )(h)
                shortcut = (
                    x if self.output_dim == input_dim
                    else ncsn_conv3x3(
                        self.output_dim, dilation=self.dilation, name="shortcut"
                    )(x)
                )
            else:
                h = ncsn_conv3x3(self.output_dim, name="conv1")(h)
                h = norm(h, "normalize2")
                h = self.act(h)
                h = ncsn_conv3x3(self.output_dim, name="conv2")(h)
                shortcut = (
                    x if self.output_dim == input_dim
                    else nn.Conv(
                        self.output_dim, (1, 1), use_bias=True, name="shortcut"
                    )(x)
                )
        else:
            raise ValueError("invalid resample value")
        return h + shortcut
