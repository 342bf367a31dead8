"""Isolated benchmark: Pallas fused int8 3x3 conv vs XLA bf16/int8 convs.

Measures the representative ncsnpplarge sampler shapes (batch 8, 10 s clips)
on the real chip. The XLA bf16 rows are what the shipping serving path runs
today (BASELINE.md: individually 90-97% MXU utilization); the Pallas row
must beat them INCLUDING its fused affine+SiLU+quantize operand read for the
int8 path to be worth enabling (the lax-int8 row pays separate quantize
passes and is the measured round-2 loss).

Run: timeout 1500 python scripts/bench_pallas_qconv.py
Prints one JSON line per shape.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.ops.pallas_qconv import qconv3x3_fused
from use_tpu.ops.qconv import qconv2d


def timed(fn, x, k, reps=3, inner=10):
    """Median seconds per op with `inner` iterations INSIDE one jit.

    One dispatch through the axon tunnel costs tens of ms, which dominates
    (and equalizes) any single-call measurement — the round-2 sweep that
    timed every variant at ~41 ms was measuring the RTT. Chaining the op
    `inner` times in a lax.scan (output fed back, so iterations cannot be
    CSE'd or overlapped away) amortizes the dispatch to noise. Requires the
    op to map [B,H,W,C] -> [B,H,W,C] (use C == O shapes for timing)."""

    @jax.jit
    def loop(x, k):
        def body(c, _):
            return fn(c.astype(x.dtype), k), None
        out, _ = jax.lax.scan(body, x, None, length=inner)
        return out

    out = loop(x, k)
    float(jnp.sum(out[0, 0, 0, :].astype(jnp.float32)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = loop(x, k)
        float(jnp.sum(out[0, 0, 0, :].astype(jnp.float32)))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)) / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--tile-hs", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--modes", nargs="*",
                    default=["dots9", "dots3", "im2col"])
    ap.add_argument("--vpu-bf16", action="store_true")
    ap.add_argument("--no-act", action="store_true",
                    help="probe: drop the SiLU from the pallas operand read")
    ap.add_argument("--no-affine", action="store_true",
                    help="probe: drop the GN affine from the operand read")
    ap.add_argument("--full", action="store_true",
                    help="include the level-1+ shapes (default: full-res only)")
    args = ap.parse_args()

    # (B, H, W, C, O): the sampler's conv population by level (batch 8, 10 s)
    shapes = [
        (8, 512, 1536, 128, 128),   # full-res resblock conv (the floor)
    ]
    if args.full:
        shapes += [
            (8, 256, 768, 128, 128),    # level 1
            (8, 128, 384, 256, 256),    # level 2+ (ch_mult 2)
            (8, 512, 1536, 256, 128),   # full-res up-path conv over [h|skip]
        ]
    rng = np.random.default_rng(0)
    for B, H, W, C, O in shapes:
        if C != O:
            print(json.dumps({"shape": [B, H, W, C, O],
                              "skipped": "loop timing needs C == O"}))
            continue
        x = jnp.asarray(
            rng.standard_normal((B, H, W, C)).astype(np.float32),
            jnp.bfloat16,
        )
        k32 = jnp.asarray(
            (rng.standard_normal((3, 3, C, O)) * 0.05).astype(np.float32)
        )
        k16 = k32.astype(jnp.bfloat16)
        u = jnp.asarray((0.02 + 0.01 * rng.random(C)).astype(np.float32))
        a = jnp.asarray(
            (1 + 0.1 * rng.standard_normal((B, C))).astype(np.float32)
        )
        o = jnp.asarray(
            (0.05 * rng.standard_normal((B, C))).astype(np.float32)
        )

        @jax.jit
        def xla_bf16(x, k):
            # the shipping path: GN-apply+SiLU fuse into the conv read
            y = x.astype(jnp.float32) * a[:, None, None, :] + o[:, None, None, :]
            y = (y * jax.nn.sigmoid(y)).astype(jnp.bfloat16)
            return jax.lax.conv_general_dilated(
                y, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        @jax.jit
        def xla_int8(x, k):
            # round-2 loser: apply+quantize materializes int8, then lax conv
            y = x.astype(jnp.float32) * a[:, None, None, :] + o[:, None, None, :]
            y = y * jax.nn.sigmoid(y)
            return qconv2d(y, k, out_dtype=jnp.bfloat16)

        @jax.jit
        def xla_bf16_conv_only(x16, k):
            # pre-activated operand: what the IN-MODEL fused bf16 conv costs
            return jax.lax.conv_general_dilated(
                x16, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)

        row = {"shape": [B, H, W, C, O]}
        flops = 2 * 9 * B * H * W * C * O
        try:
            t = timed(xla_bf16_conv_only, x, k16, reps=args.reps)
            row["xla_bf16_conv_ms"] = round(t * 1e3, 3)
            row["xla_bf16_conv_tflops"] = round(flops / t / 1e12, 1)
        except Exception as e:
            row["xla_bf16_conv_error"] = repr(e)[:200]
        try:
            t = timed(xla_bf16, x, k16, reps=args.reps)
            row["xla_bf16_ms"] = round(t * 1e3, 3)
        except Exception as e:
            row["xla_bf16_error"] = repr(e)[:200]
        try:
            t = timed(xla_int8, x, k32, reps=args.reps)
            row["xla_int8_ms"] = round(t * 1e3, 3)
        except Exception as e:
            row["xla_int8_error"] = repr(e)[:200]
        for mode in args.modes:
            for th in args.tile_hs:
                if H % th:
                    continue

                @jax.jit
                def pallas_int8(x, k, mode=mode, th=th):
                    return qconv3x3_fused(
                        x, k, u,
                        gn_scale=None if args.no_affine else a,
                        gn_shift=None if args.no_affine else o,
                        act=not args.no_act,
                        out_dtype=jnp.bfloat16, tile_h=th, mode=mode,
                        vpu_dtype=(jnp.bfloat16 if args.vpu_bf16
                                   else jnp.float32),
                    )

                key = f"pallas_{mode}_th{th}"
                try:
                    t = timed(pallas_int8, x, k32, reps=args.reps)
                    row[f"{key}_ms"] = round(t * 1e3, 3)
                    row[f"{key}_tops"] = round(flops / t / 1e12, 1)
                except Exception as e:
                    row[f"{key}_error"] = repr(e)[:200]
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
