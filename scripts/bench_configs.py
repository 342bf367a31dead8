"""Measure the remaining BASELINE.json configs-of-record on one chip.

  #2  SGMSE few-step serving: N=5 Euler-Maruyama reverse SDE
  #3  full predictor-corrector: 30 steps + annealed-Langevin (ald)
      corrector, corrector_steps=1 -> NFE=60, batched utterances
  #4  SGMSE+GAN hybrid: 30-step reverse SDE then the LSGAN generator
      refines (predict.chain=sgmse+gan semantics, cli/main.py run order)

Same scaffold as bench.py (batch 8 x 10 s clips, bf16 serving dtype, full
wav->wav timing incl. host readback, median of 3). Each config is its own
jit; compiles through the axon tunnel take ~4-6 min apiece — budget the
timeout accordingly. Prints one JSON line per config. Results are recorded
in BASELINE.md (VERDICT r4 items 1d/2/5).
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

BATCH = 8
AUDIO_SECONDS = 10.0
SR = 24000
REPS = 3
DTYPE = "bfloat16"
V5E_PEAK_FLOPS = 197e12


def timed(fn, args, rng0):
    out = fn(*args, rng0)
    np.asarray(out)  # compile + warmup
    times = []
    rng = rng0
    for _ in range(REPS):
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        np.asarray(fn(*args, sub))
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def mfu_of(jitted, args, rng0, wall):
    try:
        ca = jitted.lower(*args, rng0).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca["flops"]) / wall / V5E_PEAK_FLOPS
    except Exception:
        return None


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default="em5,pc_ald,hybrid",
                    help="comma list: em5, pc_ald, hybrid")
    args = ap.parse_args()
    which = set(args.configs.split(","))

    from use_tpu.models.sgmse.score_model import sgmse_large

    length = int(AUDIO_SECONDS * SR)
    wav = 0.1 * np.random.default_rng(0).standard_normal((BATCH, length))
    wav_dev = jnp.asarray(wav.astype(np.float32))
    audio_s = BATCH * AUDIO_SECONDS
    rng0 = jax.random.PRNGKey(1)

    def report(tag, jitted, margs, extra=None):
        wall = timed(jitted, margs, rng0)
        row = {
            "metric": f"audio_seconds_per_s_per_chip_{tag}",
            "value": round(audio_s / wall, 3),
            "unit": "audio-s/s",
            "wall_s": round(wall, 3),
        }
        mfu = mfu_of(jitted, margs, rng0, wall)
        if mfu is not None:
            row["mfu"] = round(mfu, 4)
        if extra:
            row.update(extra)
        print(json.dumps(row), flush=True)

    if "em5" in which:
        # config #2: few-step (5) Euler-Maruyama reverse SDE
        m = sgmse_large(predictor="euler_maruyama",
                        backbone_kwargs=dict(dtype=DTYPE))
        p = m.cast_params_for_inference(m.init_params(jax.random.PRNGKey(0)))

        @jax.jit
        def run_em5(p, w, rng):
            out = m.sample(p, {"perturbed": w}, rng, N=5)
            return out["enhanced"]

        report("em5_sgmse_large", run_em5, (p, wav_dev), {"nfe": 5})

    if "pc_ald" in which:
        # config #3: PC, 30 steps + ald corrector (1 step) -> NFE=60
        m = sgmse_large(corrector="ald", backbone_kwargs=dict(dtype=DTYPE))
        p = m.cast_params_for_inference(m.init_params(jax.random.PRNGKey(0)))

        @jax.jit
        def run_pc_ald(p, w, rng):
            out = m.sample(p, {"perturbed": w}, rng, N=30,
                           corrector_steps=1, snr=0.5)
            return out["enhanced"]

        report("pc30_ald_sgmse_large", run_pc_ald, (p, wav_dev), {"nfe": 60})

    if "hybrid" in which:
        # config #4: SGMSE (N=30) then LSGAN G refinement (sgmse+gan chain)
        from use_tpu.models.gan.generator import NCSNPPWrapper

        m = sgmse_large(backbone_kwargs=dict(dtype=DTYPE))
        p = m.cast_params_for_inference(m.init_params(jax.random.PRNGKey(0)))
        gen = NCSNPPWrapper(
            n_fft=1022, hop_length=160, num_frames=480,
            backbone_kwargs=dict(dtype=DTYPE),
        )
        gp = gen.init_params(jax.random.PRNGKey(2))

        @jax.jit
        def run_hybrid(p, gp, w, rng):
            out = m.sample(p, {"perturbed": w}, rng, N=30)
            return gen.forward_infer(gp, {"perturbed": out["enhanced"]})["fake"]

        wall = timed(lambda p_, w_, r_: run_hybrid(p_, gp, w_, r_),
                     (p, wav_dev), rng0)
        row = {
            "metric": "audio_seconds_per_s_per_chip_hybrid_sgmse30_gan",
            "value": round(audio_s / wall, 3),
            "unit": "audio-s/s",
            "wall_s": round(wall, 3),
            "nfe": 31,
        }
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
