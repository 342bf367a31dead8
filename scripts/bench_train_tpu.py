"""Training-step throughput of the shipping SGMSE_Large recipe on the TPU.

The headline bench (bench.py) measures serving; this measures the other
production axis — training audio-seconds consumed per wall second per chip
for the exact shipping optimization step (ncsnpplarge, 6 s crops -> 512
frames, Adam + grad clip, gradient accumulation as configured). The
reference trains this with global batch 2 x accum 4 on GPUs
(reference configs/experiment/SGMSE_Large.yaml:17-28) and publishes no
throughput numbers.

Usage: python scripts/bench_train_tpu.py [--batch 2] [--accum 4] [--reps 3]
       [--dtype float32|bfloat16]
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
CLIP_SECONDS = 6.0  # speech_splice_seconds of the shipping recipe


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--accum", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32")
    ap.add_argument("--remat-policy", default="full",
                    choices=("full", "conv_outs"))
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-block remat (OOMs one v5e at the "
                         "shipping shapes; kept for A/B on bigger slices)")
    args = ap.parse_args()

    from use_tpu.engine import optim
    from use_tpu.engine.state import TrainState
    from use_tpu.engine.train import make_sgmse_train_step
    from use_tpu.models.sgmse.score_model import sgmse_large

    model = sgmse_large(
        backbone_kwargs=dict(dtype=args.dtype, remat=not args.no_remat,
                             remat_policy=args.remat_policy)
    )
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optim.adam(5e-4, 1e-7, grad_clip=100.0, params_example=params)
    state = TrainState.create(params, tx)
    step = make_sgmse_train_step(model, tx, accum=args.accum)

    n = int(CLIP_SECONDS * SR)
    rng = np.random.default_rng(0)
    shape = (args.accum, args.batch, n) if args.accum > 1 else (args.batch, n)
    batch = {
        "clean": jnp.asarray(0.3 * rng.standard_normal(shape), jnp.float32),
        "perturbed": jnp.asarray(0.3 * rng.standard_normal(shape), jnp.float32),
    }

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)  # compile + warmup
    float(metrics["loss_Score"])

    times = []
    for _ in range(args.reps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, metrics = step(state, batch, sub)
        float(metrics["loss_Score"])  # forced readback (axon)
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[len(times) // 2]

    audio_s = args.batch * args.accum * CLIP_SECONDS
    print(
        json.dumps(
            {
                "metric": "train_audio_seconds_per_s_per_chip_sgmse_large",
                "value": round(audio_s / wall, 3),
                "unit": "audio-s/s",
                "batch": args.batch,
                "accum": args.accum,
                "dtype": args.dtype,
                "step_ms": round(wall * 1e3, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
