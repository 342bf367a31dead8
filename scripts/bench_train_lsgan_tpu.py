"""LSGAN shipping-recipe training-step throughput on the TPU.

Builds the exact shipping LSGAN experiment (NCSNPP_Wrapper G at
n_fft=1022/hop=160/480 frames + the 24k MVD discriminator bank + the
WavSpecConvergence criterion, reference configs/model/LSGAN.yaml) from the
config system and times the fused D-then-G optimization step on the chip.

Usage: python scripts/bench_train_lsgan_tpu.py [--batch 4] [--accum 2]
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
CLIP_SECONDS = 6.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--accum", type=int, default=2)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--dtype", default="float32",
                    help="generator backbone compute dtype (bfloat16 applies "
                         "the treatment that took SGMSE training +69%%; "
                         "params/normalization statistics stay f32)")
    args = ap.parse_args()

    from use_tpu.cli.main import _build_model
    from use_tpu.config.config import load_config
    from use_tpu.engine import optim
    from use_tpu.engine.state import GANTrainState, TrainState
    from use_tpu.engine.train import make_gan_train_step

    cfg = load_config(
        "LSGAN", [f"model.generator.backbone_kwargs.dtype={args.dtype}"]
    )
    gan = _build_model(cfg)
    g_params, d_params = gan.init_params(jax.random.PRNGKey(0))
    t = cfg["train"]
    g_tx = optim.adam(t["g_lr"], t["weight_decay"], params_example=g_params)
    d_tx = optim.adam(t["d_lr"], t["weight_decay"], params_example=d_params)
    state = GANTrainState(
        g=TrainState.create(g_params, g_tx), d=TrainState.create(d_params, d_tx)
    )
    step = make_gan_train_step(gan, g_tx, d_tx, accum=args.accum)

    n = int(CLIP_SECONDS * SR)
    rng = np.random.default_rng(0)
    shape = (args.accum, args.batch, n) if args.accum > 1 else (args.batch, n)
    batch = {
        "clean": jnp.asarray(0.3 * rng.standard_normal(shape), jnp.float32),
        "perturbed": jnp.asarray(0.3 * rng.standard_normal(shape), jnp.float32),
    }

    key = jax.random.PRNGKey(1)
    state, metrics = step(state, batch, key)
    float(metrics["loss_G"])

    times = []
    for _ in range(args.reps):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, metrics = step(state, batch, sub)
        float(metrics["loss_G"])
        times.append(time.perf_counter() - t0)
    wall = sorted(times)[len(times) // 2]

    audio_s = args.batch * args.accum * CLIP_SECONDS
    print(
        json.dumps(
            {
                "metric": "train_audio_seconds_per_s_per_chip_lsgan",
                "value": round(audio_s / wall, 3),
                "unit": "audio-s/s",
                "batch": args.batch,
                "accum": args.accum,
                "dtype": args.dtype,
                "step_ms": round(wall * 1e3, 1),
                "loss_G": round(float(metrics["loss_G"]), 4),
                "loss_D": round(float(metrics["loss_D"]), 4),
            }
        )
    )


if __name__ == "__main__":
    main()
