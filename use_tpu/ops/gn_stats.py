"""One-pass GroupNorm statistics as a Pallas TPU kernel.

XLA computes E[x] and E[x^2] for GroupNorm as two separate reduce fusions
over the activation (and, where the producer is a concatenate or has other
consumers, cannot sink the reduction into the producing convolution) — the
activation is read from HBM twice. This kernel produces both per-channel
sums in ONE pass with fp32 accumulators; the tiny channel->group reduction
happens outside in XLA.

The reference has no analog (torch GroupNorm is cuDNN's); this exists purely
for TPU HBM-bandwidth reasons. Reference behavior being matched:
GroupNorm(num_groups=min(C//4,32), eps=1e-6) as used across NCSN++
(reference src/models/components/sgmse/backbones/ncsnpp_utils/layerspp.py).

Numerics: identical accumulation dtype (fp32) and the same E[x^2]-E[x]^2
variance as the XLA path in use_tpu.models.ncsnpp.layers.GroupNormAct.
Gradients are exact via custom_vjp (d sum/dx = 1, d sumsq/dx = 2x).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:  # pallas is TPU/GPU-only; keep importable on bare CPU builds
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _HAS_PALLAS = True
except Exception:  # pragma: no cover
    _HAS_PALLAS = False

# Largest spatial tile per grid step: [TILE_S, C] must fit VMEM comfortably
# next to its double-buffered twin (C<=512 -> <=4 MB for bf16 at 4096).
import os as _os

_TILE_S = int(_os.environ.get("USE_TPU_GN_TILE", "4096"))


def _kernel(x_ref, s_ref, ss_ref):
    # grid = (B, S/TILE_S); outputs are whole [B, C] blocks resident in VMEM
    # across the (sequential) grid, accumulated per batch row.
    i = pl.program_id(0)
    j = pl.program_id(1)
    xf = x_ref[0].astype(jnp.float32)  # [TILE_S, C]
    ps = jnp.sum(xf, axis=0)  # [C]
    pss = jnp.sum(xf * xf, axis=0)

    @pl.when(j == 0)
    def _():
        s_ref[i, :] = ps
        ss_ref[i, :] = pss

    @pl.when(j != 0)
    def _():
        s_ref[i, :] = s_ref[i, :] + ps
        ss_ref[i, :] = ss_ref[i, :] + pss


def _sums_xla(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    s = jnp.sum(x, axis=1, dtype=jnp.float32)
    ss = jnp.sum(jnp.square(x), axis=1, dtype=jnp.float32)
    return s, ss


def pallas_ok(x: jnp.ndarray, tile_s: int = _TILE_S) -> bool:
    """Whether the pallas path applies to a [B, S, C] activation."""
    if not _HAS_PALLAS:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    b, s, c = x.shape
    return c % 128 == 0 and c <= 1024 and s % tile_s == 0 and s >= 4 * tile_s


@jax.custom_vjp
def channel_sums(x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(sum_x, sum_x2) over axis 1 of [B, S, C], fp32, one HBM pass."""
    return _channel_sums_impl(x)


def _channel_sums_impl(x, tile_s: int = _TILE_S):
    # tile_s threads all the way into the grid/BlockSpec so the pallas_ok
    # gate and the kernel always agree on tiling (ADVICE r1).
    if not pallas_ok(x, tile_s=tile_s):
        return _sums_xla(x)
    b, s, c = x.shape
    grid = (b, s // tile_s)
    out = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_s, c), lambda i, j: (i, j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((b, c), lambda i, j: (0, 0)),
            pl.BlockSpec((b, c), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c), jnp.float32),
            jax.ShapeDtypeStruct((b, c), jnp.float32),
        ],
    )(x)
    return out[0], out[1]


def _fwd(x):
    return _channel_sums_impl(x), x


def _bwd(x, cot):
    ds, dss = cot  # [B, C] each
    dx = ds[:, None, :] + 2.0 * x.astype(jnp.float32) * dss[:, None, :]
    return (dx.astype(x.dtype),)


channel_sums.defvjp(_fwd, _bwd)


def group_mean_meansq(
    x: jnp.ndarray, groups: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-(batch, group) mean and mean-square of [B, S, C] in one HBM pass.

    Groups are contiguous channel ranges (C % groups == 0), matching
    GroupNorm semantics.
    """
    b, s, c = x.shape
    cg = c // groups
    sum_x, sum_x2 = channel_sums(x)
    n = float(s * cg)
    mean = jnp.sum(sum_x.reshape(b, groups, cg), axis=-1) / n
    meansq = jnp.sum(sum_x2.reshape(b, groups, cg), axis=-1) / n
    return mean, meansq
