"""Benchmark the parallel (Picard/ParaDiGMS) sampler vs the sequential scan.

Measures single-stream (batch-1) 30-step SGMSE_Large enhancement latency on
one chip for the sequential PC sampler vs parallel_pc at several window
sizes, and reports the sweep counts. Two distinct effects:

1. Single chip: the window turns the batch-1 network eval (which XLA
   space-to-batches, ~1.7x slower per clip) into a real batch-W eval, so
   wall-clock per sweep grows sublinearly in W; if the trajectory converges
   in fewer sweeps than N, single-stream latency drops.
2. Multi chip (reported analytically from the measured sweep count): with
   the window axis sharded over D devices, per-sweep wall-clock is ~1/D of
   the batch-W eval, so latency speedup -> N / sweeps for D >= W.

Convergence rate (window advance per sweep) depends on the score network:
a trained score is contractive toward the clean-speech manifold; the
random-init weights used here are a lower bound on realism — rerun with a
converted reference checkpoint for production numbers.

Usage: python scripts/bench_parallel_sampler.py [--seconds 10] [--n 30]
"""
from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--windows", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--tol", type=float, default=0.1)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    from use_tpu.models.sgmse.score_model import sgmse_large
    from use_tpu.ops import pad_spec

    model = sgmse_large(backbone_kwargs=dict(dtype=args.dtype))
    params = model.cast_params_for_inference(
        model.init_params(jax.random.PRNGKey(0))
    )

    sr = 24000
    wav = 0.1 * np.random.default_rng(0).standard_normal(
        (1, int(args.seconds * sr))
    ).astype(np.float32)
    y_spec = pad_spec(model._spec(jnp.asarray(wav)))
    cond = [y_spec]

    def timed(fn, rng):
        out = fn(params, y_spec, rng)
        jax.tree_util.tree_map(lambda a: float(jnp.sum(jnp.abs(a))), out[0])
        times = []
        nfe = None
        for i in range(args.reps):
            sub = jax.random.fold_in(rng, i)
            t0 = time.perf_counter()
            out = fn(params, y_spec, sub)
            float(jnp.sum(jnp.abs(out[0])))  # force readback
            times.append(time.perf_counter() - t0)
            nfe = int(out[1]) if hasattr(out[1], "item") or not isinstance(out[1], int) else out[1]
        return sorted(times)[len(times) // 2], nfe

    results = {}

    @jax.jit
    def run_pc(params, y_spec, rng):
        return model.sample_spec(params, y_spec, rng, cond, sampler_type="pc", N=args.n)

    t_pc, _ = timed(run_pc, jax.random.PRNGKey(1))
    results["sequential_s"] = round(t_pc, 3)

    for w in args.windows:
        @jax.jit
        def run_ppc(params, y_spec, rng, w=w):
            return model.sample_spec(
                params, y_spec, rng, cond,
                sampler_type="parallel_pc", N=args.n, window=w, tol=args.tol,
            )

        t_ppc, nfe = timed(run_ppc, jax.random.PRNGKey(1))
        # the sampler clamps W = min(window, N) internally; divide by the
        # effective window or sweeps would be understated for w > N
        sweeps = nfe // min(w, args.n)
        results[f"parallel_w{w}"] = {
            "latency_s": round(t_ppc, 3),
            "sweeps": sweeps,
            "n_steps": args.n,
            "single_chip_speedup": round(t_pc / t_ppc, 3),
            "ideal_Dchip_speedup": round(args.n / max(sweeps, 1), 3),
        }

    print(json.dumps(results))


if __name__ == "__main__":
    main()
