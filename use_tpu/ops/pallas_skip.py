"""Pallas fused residual-shortcut: out = (h + x @ W + b) * scale.

The last measured serving-headroom category (BASELINE.md round-2
attribution): the BigGAN resblock's 1x1 shortcut convolutions run at
1.3-1.5x their HBM bound (~51 ms of a 378 ms sampler step), and the two
XLA-level reformulations tried (channel einsum, concat-split) both lost or
tied. This kernel is the round-4 attempt (VERDICT r3 item 8): read the
block input x ONCE per tile, compute the 1x1 shortcut as an MXU dot over
the channel (minor) axis, add the residual branch h and apply the
skip_rescale 1/sqrt(2) in the same pass, write once — the minimal-traffic
formulation (read x + read h + write out).

Exactness: bit-comparable to the XLA reference formulation up to dot
accumulation order (fp32 accumulation either way); tested in
tests/test_pallas_skip.py. Measured on the real shapes by
scripts/bench_skip_fuse.py — integrated only if it beats XLA's emitter
end-to-end (see BASELINE.md for the verdict).

Reference counterpart of the op being accelerated:
/root/reference/src/models/components/sgmse/backbones/ncsnpp_utils/
layerspp.py:237-314 (ResnetBlockBigGANpp shortcut + skip_rescale).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, h_ref, w_ref, b_ref, o_ref, *, scale: float):
    th, width, ci = x_ref.shape[1], x_ref.shape[2], x_ref.shape[3]
    co = o_ref.shape[3]
    x = x_ref[...].reshape(th * width, ci)
    s = jnp.dot(x, w_ref[...], preferred_element_type=jnp.float32)
    s = s + b_ref[...].astype(jnp.float32)
    h = h_ref[...].reshape(th * width, co).astype(jnp.float32)
    o = (h + s) * scale
    o_ref[...] = o.astype(o_ref.dtype).reshape(o_ref.shape)


def fused_skip_add(
    x: jax.Array,
    h: jax.Array,
    w: jax.Array,
    b: jax.Array,
    scale: float = 1.0,
    tile_h: int = 2,
) -> jax.Array:
    """(h + conv1x1(x; w, b)) * scale for NHWC x [B,H,W,Ci], h [B,H,W,Co].

    One row-tiled pass: per tile, x is read once, the 1x1 conv runs as an
    MXU dot over the channel axis, and the residual add + rescale happen
    before the single output write.
    """
    bsz, height, width, ci = x.shape
    co = h.shape[-1]
    assert w.shape == (ci, co), (w.shape, ci, co)
    assert height % tile_h == 0, (height, tile_h)

    grid = (bsz, height // tile_h)
    return pl.pallas_call(
        functools.partial(_kernel, scale=float(scale)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_h, width, ci), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, tile_h, width, co), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((ci, co), lambda i, j: (0, 0)),
            pl.BlockSpec((co,), lambda i, j: (0,)),
        ],
        out_specs=pl.BlockSpec((1, tile_h, width, co), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((bsz, height, width, co), h.dtype),
    )(x, h, w, b)


def reference_skip_add(x, h, w, b, scale: float = 1.0):
    """The XLA formulation this kernel replaces (conv1x1 + add + scale)."""
    s = jax.lax.conv_general_dilated(
        x, w.reshape(1, 1, *w.shape), (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return (h + s) * scale
