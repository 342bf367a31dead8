"""Pallas int8 3x3 convolution with quantization fused into the operand read.

BASELINE.md round-2 finding: int8 serving via lax.conv LOSES ~8% end-to-end
despite the MXU running 2x, because (a) the GroupNorm-apply+quantize pass
must MATERIALIZE its int8 output (+73 ms/step — in bf16 the apply fuses into
the consuming convolution's operand read and costs nothing), (b) the
dequantized conv output stops XLA from sinking the next GroupNorm's
statistics reduce into the conv fusion (+22 ms), and (c) the FIR transitions
re-quantize (+8 ms). The identified fix (BASELINE.md:113-117) is a Pallas
conv that quantizes in the operand read — this module.

The kernel reads the RAW resblock activation in bf16 (one HBM read, same as
the bf16 baseline), applies the folded GroupNorm per-(batch,channel)
scale/shift and SiLU on the VMEM tile, quantizes in registers against the
analytic per-channel k-sigma scale (see GroupNormAct quant='scale'), and
runs the 3x3 SAME conv as 9 int8 MXU dots accumulated in int32. No int8 (or
normalized-bf16) tensor ever exists in HBM.

Decomposition: out[h, w, o] = sum_{dy,dx} q[h+dy-1, w+dx-1, c] * qw[dy,dx,c,o]
with rows tiled TH at a time (halo rows DMA'd from HBM, zeroed at image
edges) and the three column shifts materialized once per tile in VMEM (int8
copies; VMEM-bandwidth noise next to the MXU work). Per-channel activation
scales u_c fold into the weight quantization exactly (w_eff = w * u_c), the
same identity as ops/qconv.py::qconv2d_prequant.

Serving-only (no VJP). Gated by the backbone quant='int8_pallas' option.
Reference analog: none (the reference serves fp32/fp16 CUDA); this exists to
push the v5e past the bf16 conv roofline (197 -> 394 T(FL)OPS).
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    x_blk,  # [1, TH, W, C] bf16 (auto-pipelined block)
    x_any,  # [B, H, W, C] full array (halo-row DMA source)
    a_ref,  # [B, C] f32 folded GN scale (or ones)
    o_ref,  # [B, C] f32 folded GN shift (or zeros)
    iu_ref,  # [1, C] f32 reciprocal activation quant scales
    qw_ref,  # [9*C, O] int8 (tap-major)
    sw_ref,  # [1, O] f32 dequant scales (include folded u_c)
    b_ref,  # [1, O] f32 bias (zeros when absent)
    out_blk,  # [1, TH, W, O]
    top,  # scratch [1, W, C] bf16
    bot,  # scratch [1, W, C] bf16
    sems,  # DMA semaphores (2,)
    *,
    TH: int,
    C: int,
    O: int,
    act: bool,
    affine: bool,
    mode: str = "dots9",
    vpu_dtype=jnp.float32,
):
    b = pl.program_id(0)
    hb = pl.program_id(1)
    n_h = pl.num_programs(1)
    W = x_blk.shape[2]

    # ---- halo rows: DMA from HBM, zeros at the image edges (SAME padding)
    @pl.when(hb > 0)
    def _():
        cp = pltpu.make_async_copy(
            x_any.at[b, pl.ds(hb * TH - 1, 1)], top, sems.at[0]
        )
        cp.start()
        cp.wait()

    @pl.when(hb == 0)
    def _():
        top[:] = jnp.zeros_like(top)

    @pl.when(hb < n_h - 1)
    def _():
        cp = pltpu.make_async_copy(
            x_any.at[b, pl.ds(hb * TH + TH, 1)], bot, sems.at[1]
        )
        cp.start()
        cp.wait()

    @pl.when(hb == n_h - 1)
    def _():
        bot[:] = jnp.zeros_like(bot)

    # ---- fused affine + activation + quantize (the operand read)
    av = a_ref[b][None, None, :].astype(vpu_dtype) if affine else None
    ov = o_ref[b][None, None, :].astype(vpu_dtype) if affine else None
    iu = iu_ref[0][None, None, :].astype(vpu_dtype)

    def affq(xv):
        y = xv.astype(vpu_dtype)
        if affine:
            y = y * av + ov
        if act:
            y = y * jax.nn.sigmoid(y)
        y = (y * iu).astype(jnp.float32)
        return jnp.clip(jnp.round(y), -127.0, 127.0).astype(jnp.int8)

    # Image-edge halo rows are zero in the PADDED (post-affine/act/quantize)
    # tensor — SAME padding pads the conv operand, so affq(0) (nonzero when
    # a shift/activation is fused) must not leak in; mask to quantized zero.
    q_top = jnp.where(hb > 0, affq(top[:]), jnp.int8(0))
    q_bot = jnp.where(hb < n_h - 1, affq(bot[:]), jnp.int8(0))
    q = jnp.concatenate([q_top, affq(x_blk[0]), q_bot], axis=0)  # [TH+2, W, C]

    # three column shifts (dx = 0, 1, 2 taps read columns w-1, w, w+1)
    zc = jnp.zeros((TH + 2, 1, C), jnp.int8)
    q_m1 = jnp.concatenate([zc, q[:, : W - 1]], axis=1)
    q_p1 = jnp.concatenate([q[:, 1:], zc], axis=1)
    shifted = (q_m1, q, q_p1)

    def idot(m, w):
        return jax.lax.dot_general(
            m, w,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    if mode == "dots9":  # 9 dots of K=C; qw is (dy,dx)-major [9C, O]
        acc = jnp.zeros((TH * W, O), jnp.int32)
        for dy in range(3):
            for dx in range(3):
                m = shifted[dx][dy : dy + TH].reshape(TH * W, C)
                acc = acc + idot(m, qw_ref[(dy * 3 + dx) * C : (dy * 3 + dx + 1) * C])
    elif mode == "dots3":  # 3 dots of K=3C; qw is dx-major [dx][dy] [9C, O]
        acc = jnp.zeros((TH * W, O), jnp.int32)
        for dx in range(3):
            m = jnp.concatenate(
                [shifted[dx][dy : dy + TH] for dy in range(3)], axis=-1
            ).reshape(TH * W, 3 * C)
            acc = acc + idot(m, qw_ref[dx * 3 * C : (dx + 1) * 3 * C])
    elif mode == "im2col":  # one dot of K=9C; qw is (dy,dx)-major [9C, O]
        m = jnp.concatenate(
            [shifted[dx][dy : dy + TH] for dy in range(3) for dx in range(3)],
            axis=-1,
        ).reshape(TH * W, 9 * C)
        acc = idot(m, qw_ref[:])
    else:
        raise ValueError(mode)

    y = acc.astype(jnp.float32) * sw_ref[0][None, :] + b_ref[0][None, :]
    out_blk[0] = y.reshape(TH, W, O).astype(out_blk.dtype)


def _quantize_weight_folded(
    kernel: jnp.ndarray, u: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """HWIO kernel + per-input-channel act scales -> (int8 [9*C, O], f32 [O])."""
    w_eff = kernel.astype(jnp.float32) * u[None, None, :, None]
    s = jnp.max(jnp.abs(w_eff), axis=(0, 1, 2)) / 127.0
    s = jnp.maximum(s, 1e-12)
    qw = jnp.clip(jnp.round(w_eff / s), -127.0, 127.0).astype(jnp.int8)
    kh, kw, c, o = kernel.shape
    return qw.reshape(kh * kw * c, o), s


def auto_tile_h(H: int, W: int, C: int, O: int, mode: str = "dots9") -> int:
    """Largest row-tile whose VMEM footprint stays under ~12 MB."""
    for th in (16, 8, 4, 2, 1):
        if H % th:
            continue
        est = (
            2 * th * W * C * 2          # double-buffered bf16 input block
            + 3 * (th + 2) * W * C      # quantized + 2 shifted int8 copies
            + th * W * O * 4            # int32 accumulator
            + 2 * th * W * O * 2        # double-buffered bf16 output block
            + 2 * 2 * W * C             # halo rows
            + 9 * C * O                 # int8 weights
        )
        if mode == "im2col":
            est += th * W * 9 * C  # the gathered [M, 9C] operand
        if est <= 12 * 1024 * 1024:
            return th
    return 1


def qconv3x3_fused(
    x: jnp.ndarray,
    kernel: jnp.ndarray,
    u: jnp.ndarray,
    *,
    gn_scale: Optional[jnp.ndarray] = None,
    gn_shift: Optional[jnp.ndarray] = None,
    act: bool = False,
    bias: Optional[jnp.ndarray] = None,
    out_dtype=jnp.bfloat16,
    tile_h: Optional[int] = None,
    mode: str = "dots9",
    vpu_dtype=jnp.float32,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused (GN-affine -> SiLU -> int8 quantize -> 3x3 SAME conv -> dequant).

    x        [B, H, W, C]  raw activation (bf16/f32)
    kernel   [3, 3, C, O]  fp weights (quantized per output channel inside,
                           with u folded — exact, see qconv2d_prequant)
    u        [C]           per-channel activation quant scales (k-sigma
                           analytic from GroupNormAct, or data max-abs/127)
    gn_scale/gn_shift [B, C]  folded GroupNorm stats+affine; None = identity
    act      apply SiLU after the affine
    """
    B, H, W, C = x.shape
    kh, kw, Ck, O = kernel.shape
    assert (kh, kw) == (3, 3) and Ck == C, (kernel.shape, x.shape)
    if tile_h is None:
        tile_h = auto_tile_h(H, W, C, O, mode)
    assert H % tile_h == 0, (H, tile_h)
    TH = tile_h
    if interpret is None:  # Mosaic needs a TPU; CPU (tests) interprets
        interpret = jax.default_backend() == "cpu"

    affine = gn_scale is not None
    a = (gn_scale if affine else jnp.ones((B, C))).astype(jnp.float32)
    o = (gn_shift if affine else jnp.zeros((B, C))).astype(jnp.float32)
    u = jnp.asarray(u, jnp.float32)
    iu = (1.0 / u).reshape(1, C)
    qw, sw = _quantize_weight_folded(kernel, u)
    if mode == "dots3":  # dx-major weight rows (see kernel)
        qw = qw.reshape(3, 3, C, O).transpose(1, 0, 2, 3).reshape(9 * C, O)
    sw = sw.reshape(1, O)
    bz = (bias if bias is not None else jnp.zeros((O,))).astype(jnp.float32)
    bz = bz.reshape(1, O)

    grid = (B, H // TH)
    kern = functools.partial(
        _kernel, TH=TH, C=C, O=O, act=act, affine=affine,
        mode=mode, vpu_dtype=vpu_dtype,
    )
    flops = 2 * 9 * B * H * W * C * O
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, TH, W, C), lambda b, h: (b, h, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, TH, W, O), lambda b, h: (b, h, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W, O), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((1, W, C), x.dtype),
            pltpu.VMEM((1, W, C), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.size * x.dtype.itemsize + B * H * W * O * 2,
            transcendentals=x.size if act else 0,
        ),
        interpret=interpret,
    )(x, x, a, o, iu, qw, sw, bz)


def qconv3x3_reference(
    x, kernel, u, *, gn_scale=None, gn_shift=None, act=False, bias=None,
    out_dtype=jnp.bfloat16,
):
    """Same integer arithmetic through lax ops — the correctness oracle.
    (Every step is exact integer/float math, so the Pallas kernel must
    match this bit-for-bit up to the final f32->out_dtype rounding.)"""
    B, H, W, C = x.shape
    y = x.astype(jnp.float32)
    if gn_scale is not None:
        y = y * gn_scale[:, None, None, :] + gn_shift[:, None, None, :]
    if act:
        y = y * jax.nn.sigmoid(y)
    u = jnp.asarray(u, jnp.float32)
    # multiply by the reciprocal, same formulation as the kernel (y/u can
    # round differently at the .5 boundary)
    q = jnp.clip(jnp.round(y * (1.0 / u)), -127.0, 127.0).astype(jnp.int8)
    qw, sw = _quantize_weight_folded(kernel, u)
    qw = qw.reshape(3, 3, C, -1)
    out = jax.lax.conv_general_dilated(
        q, qw, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    out = out.astype(jnp.float32) * sw[None, None, None, :]
    if bias is not None:
        out = out + bias[None, None, None, :]
    return out.astype(out_dtype)
