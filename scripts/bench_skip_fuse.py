"""Measure the fused residual-shortcut Pallas kernel vs XLA (VERDICT r3 #8).

Real full-res up-block shapes (batch-8 serving, 10 s clips):
x [8,512,1536,256] bf16 -> shortcut 1x1 -> +h [8,512,1536,128] * 1/sqrt2.

Timing rule (axon): one dispatch costs ~40 ms RTT, so each variant chains
`--inner` iterations inside ONE jit via lax.scan with the output fed back
(prevents CSE/overlap), then divides.

HBM floor for the op: read x (3.2 GB) + read h (1.6 GB) + write (1.6 GB)
= 6.4 GB @ 819 GB/s ~= 7.8 ms. Round-2 attribution measured the in-model
XLA emitter at ~11 ms for the conv alone.
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

from use_tpu.ops.pallas_skip import fused_skip_add, reference_skip_add


def timed(make_fn, args, inner, reps=3):
    fn = jax.jit(make_fn)
    out = fn(*args)
    jax.tree.map(lambda a: float(jnp.sum(jnp.abs(a).astype(jnp.float32))), out)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.tree.map(
            lambda a: float(jnp.sum(jnp.abs(a).astype(jnp.float32))), out
        )
        times.append(time.perf_counter() - t0)
    return sorted(times)[1] / inner


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--tiles", type=int, nargs="*", default=[1, 2, 4])
    ap.add_argument("--shape", type=int, nargs=4, default=[8, 512, 1536, 256])
    args = ap.parse_args()

    b, hgt, wid, ci = args.shape
    co = ci // 2
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((b, hgt, wid, ci)) * 0.1, jnp.bfloat16)
    h0 = jnp.asarray(rng.standard_normal((b, hgt, wid, co)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((ci, co)) * 0.05, jnp.bfloat16)
    bias = jnp.asarray(rng.standard_normal((co,)) * 0.05, jnp.bfloat16)
    scale = 2 ** -0.5

    def chain(op):
        def run(x, h):
            def body(carry, _):
                x, h = carry
                o = op(x, h)
                # feed the output back into both operands (defeats CSE)
                x = x + 0.001 * jnp.concatenate([o, o], axis=-1)
                h = h + 0.001 * o
                return (x, h), ()

            (x, h), _ = jax.lax.scan(body, (x, h), None, length=args.inner)
            return h

        return run

    ms = timed(
        chain(lambda x, h: reference_skip_add(x, h, w, bias, scale)),
        (x0, h0), args.inner,
    ) * 1e3
    print(json.dumps({"variant": "xla_conv1x1_add", "ms": round(ms, 2)}))

    for th in args.tiles:
        try:
            msp = timed(
                chain(lambda x, h, _th=th: fused_skip_add(
                    x, h, w, bias, scale, tile_h=_th)),
                (x0, h0), args.inner,
            ) * 1e3
            print(json.dumps({"variant": f"pallas_tile{th}", "ms": round(msp, 2)}))
        except Exception as e:  # noqa: BLE001 — record per-tile failures
            print(json.dumps({"variant": f"pallas_tile{th}", "error": repr(e)[:200]}))


if __name__ == "__main__":
    main()
