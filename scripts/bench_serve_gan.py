"""Serving throughput of the predictive (LSGAN/NCSNPP_Wrapper) family.

The NFE=1 predictive enhancer is the high-throughput serving option next
to the diffusion headline (bench.py): one STFT -> NCSN++(discriminative)
-> iSTFT per clip. BASELINE.md's speed-of-light analysis puts its ceiling
near ~300 audio-s/s per v5e chip.

Usage: python scripts/bench_serve_gan.py [--batch 8] [--seconds 10]
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

SR = 24000


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from use_tpu.models.gan.generator import NCSNPPWrapper

    gen = NCSNPPWrapper(
        n_fft=1022, hop_length=160, num_frames=480,
        backbone_kwargs=dict(dtype=args.dtype),
    )
    params = gen.init_params(jax.random.PRNGKey(0))

    n = int(args.seconds * SR)
    wav = 0.1 * np.random.default_rng(0).standard_normal((args.batch, n))
    batch = {"perturbed": jnp.asarray(wav, jnp.float32)}

    @jax.jit
    def run(params, batch):
        return gen.forward_infer(params, batch)["fake"]

    out = run(params, batch)
    float(jnp.sum(jnp.abs(out)))  # compile + warmup

    times = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = run(params, batch)
        float(jnp.sum(jnp.abs(out)))
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[len(times) // 2]

    audio_s = args.batch * args.seconds
    print(
        json.dumps(
            {
                "metric": "serve_audio_seconds_per_s_per_chip_lsgan_nfe1",
                "value": round(audio_s / wall, 3),
                "unit": "audio-s/s",
                "batch": args.batch,
                "dtype": args.dtype,
            }
        )
    )


if __name__ == "__main__":
    main()
