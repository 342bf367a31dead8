"""Microbenchmark the memory-bound side ops of ncsnpplarge on the real chip.

BASELINE.md attributes the gap to the bf16 roofline (~35% of a sampler step)
to full-resolution GroupNorm statistic reduces (~2.2x the one-read HBM
bound), 1x1 skip convolutions (~2x their HBM bound) and the FIR resampling
transitions. This script measures isolated alternatives for each at the
shipping serving shape (batch 8, 10 s -> [8, 512, 1536, C]) so default-path
changes are data-driven rather than guessed.

Usage: python scripts/bench_microops.py [--which gn|conv1x1|fir|all]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 512, 1536


def timeit(fn, *args, reps=12, warmup=2):
    """Per-dispatch device time via a two-point fit.

    Host-side timing through the axon tunnel pays ~50-60 ms of per-readback
    latency, dwarfing millisecond ops. Instead: enqueue R dispatches
    back-to-back and block once, at two different R — the slope
    (t(R2)-t(R1))/(R2-R1) cancels the constant tunnel/readback overhead.
    Per-dispatch host cost stays in the slope, so treat results as an upper
    bound (relative comparisons between variants are what matter).
    """
    for _ in range(warmup):
        out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0][..., :1])))

    def run(n):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), out)
        float(jnp.sum(jnp.abs(jax.tree.leaves(out)[0][..., :1])))
        return time.perf_counter() - t0

    r1, r2 = max(reps // 4, 1), reps
    times = [(run(r2) - run(r1)) / (r2 - r1) for _ in range(3)]
    return sorted(times)[1]


def report(name, ms, note=""):
    print(f"{name:<44} {ms*1e3:9.3f} ms  {note}")


def bench_gn(c=128):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, c)), jnp.bfloat16
    )
    groups = min(max(c // 4, 1), 32)
    cg = c // groups
    read_ms = x.size * 2 / 819e9 * 1e3

    @jax.jit
    def grouped(x):
        xg = x.reshape(B, -1, groups, cg)
        mean = jnp.mean(xg, axis=(1, 3), dtype=jnp.float32)
        meansq = jnp.mean(jnp.square(xg), axis=(1, 3), dtype=jnp.float32)
        return mean, meansq

    @jax.jit
    def per_channel(x):
        xc = x.reshape(B, -1, c)
        s = jnp.sum(xc, axis=1, dtype=jnp.float32)
        ss = jnp.sum(jnp.square(xc), axis=1, dtype=jnp.float32)
        n = float(H * W * cg)
        mean = jnp.sum(s.reshape(B, groups, cg), axis=-1) / n
        meansq = jnp.sum(ss.reshape(B, groups, cg), axis=-1) / n
        return mean, meansq

    print(f"-- GroupNorm stats [{B},{H},{W},{c}] bf16 "
          f"(one-read bound {read_ms:.2f} ms @819GB/s)")
    report("grouped reshape reduce (current)", timeit(grouped, x))
    report("per-channel sums + tiny combine", timeit(per_channel, x))
    try:
        from use_tpu.ops.gn_stats import group_mean_meansq, pallas_ok

        x3 = x.reshape(B, -1, c)
        if pallas_ok(x3):
            pallas = jax.jit(functools.partial(group_mean_meansq, groups=groups))
            report("pallas channel_sums kernel", timeit(pallas, x3))
        else:
            print("pallas gate rejected the shape")
    except Exception as e:  # pragma: no cover
        print(f"pallas path unavailable: {e}")


def bench_conv1x1(cin=256, cout=128):
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, cin)), jnp.bfloat16
    )
    k = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 1, cin, cout)) * 0.05,
        jnp.bfloat16,
    )
    bias = jnp.zeros((cout,), jnp.bfloat16)
    bytes_ = (x.size + B * H * W * cout) * 2
    bw_ms = bytes_ / 819e9 * 1e3

    @jax.jit
    def conv(x, k, bias):
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        return y + bias

    @jax.jit
    def einsum(x, k, bias):
        return jnp.einsum("bhwc,cd->bhwd", x, k[0, 0]) + bias

    @jax.jit
    def dot2d(x, k, bias):
        y = jax.lax.dot_general(
            x.reshape(-1, cin), k[0, 0], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        return (y + bias).reshape(B, H, W, cout)

    print(f"-- 1x1 conv [{B},{H},{W},{cin}]->{cout} bf16 "
          f"(HBM bound {bw_ms:.2f} ms)")
    report("lax conv (current)", timeit(conv, x, k, bias))
    report("einsum over channels", timeit(einsum, x, k, bias))
    report("reshape + dot_general", timeit(dot2d, x, k, bias))


def bench_fir(c=128):
    from use_tpu.ops.upfirdn2d import downsample_2d, upsample_2d

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, c)), jnp.bfloat16
    )
    xs = jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H // 2, W // 2, c)),
        jnp.bfloat16,
    )
    down_bytes = (x.size + x.size // 4) * 2
    up_bytes = (xs.size + xs.size * 4) * 2
    print(f"-- FIR resample [{B},{H},{W},{c}] bf16")
    report(
        "downsample_2d (dense depthwise)",
        timeit(jax.jit(lambda a: downsample_2d(a, (1.0, 3.0, 3.0, 1.0))), x),
        f"(HBM bound {down_bytes/819e9*1e3:.2f} ms)",
    )
    report(
        "upsample_2d (dense depthwise)",
        timeit(jax.jit(lambda a: upsample_2d(a, (1.0, 3.0, 3.0, 1.0))), xs),
        f"(HBM bound {up_bytes/819e9*1e3:.2f} ms)",
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", default="all", choices=["gn", "conv1x1", "fir", "all"])
    args = ap.parse_args()
    print(f"backend: {jax.default_backend()}, device: {jax.devices()[0]}")
    if args.which in ("gn", "all"):
        bench_gn(128)
        bench_gn(256)
    if args.which in ("conv1x1", "all"):
        bench_conv1x1(256, 128)
        bench_conv1x1(128, 128)
    if args.which in ("fir", "all"):
        bench_fir(128)


if __name__ == "__main__":
    main()
