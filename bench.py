"""Headline benchmark: audio-seconds/s per chip, 30-step reverse-SDE sampling.

Runs the shipping SGMSE_Large configuration (ncsnpplarge ~60M score network,
n_fft=1022, hop=160) through the fused lax.scan PC sampler
(predictor=reverse_diffusion, corrector=none -> NFE=30) on one chip and
reports real-time throughput. The timed region is the FULL enhancement —
STFT + magnitude compression + %64-frame padding, the 30-step sampler,
spec_back + iSTFT, and the host readback of the enhanced waveform — the
honest wav->wav serving cost (the rtf definition of reference
model.py:396-400); the sampler-only figure is reported alongside. The
reference publishes no numbers (BASELINE.md); vs_baseline is measured
against this repo's north-star target of 50x real time per v5e chip
(BASELINE.json). NOTE: 50x exceeds the v5e roofline for this model/NFE —
30-step sampling costs 19.4 TFLOP per audio-second, capping a 197-TFLOP/s
chip at ~10 audio-s/s; see the speed-of-light analysis in BASELINE.md.
Serving batch is 8: a real batch stops XLA space-to-batching the batch-1
convolutions (~1.7x per clip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

# Optional PRNG implementation override (USE_BENCH_RNG=rbg): threefry2x32 is
# the JAX default but is VPU-heavy on TPU; rbg uses the hardware generator.
# Sampling noise only needs to be i.i.d. Gaussian in distribution.
if os.environ.get("USE_BENCH_RNG"):
    jax.config.update("jax_default_prng_impl", os.environ["USE_BENCH_RNG"])

N_STEPS = 30
BATCH = int(os.environ.get("USE_BENCH_BATCH", "8"))
AUDIO_SECONDS = 10.0
SR = 24000
REPS = 3
TARGET_RTF = 50.0  # north star: >50x real time per chip
# serving dtype: bf16 compute with fp32 params/normalization stats
DTYPE = os.environ.get("USE_BENCH_DTYPE", "bfloat16")


def main() -> None:
    from use_tpu.models.sgmse.score_model import sgmse_large
    from use_tpu.ops import pad_spec

    model = sgmse_large(backbone_kwargs=dict(dtype=DTYPE))
    params = model.init_params(jax.random.PRNGKey(0))
    # one-time cast to the serving dtype (keeps GN affines + GFP fp32)
    params = model.cast_params_for_inference(params)

    length = int(AUDIO_SECONDS * SR)
    wav = 0.1 * np.random.default_rng(0).standard_normal((BATCH, length))
    wav = wav.astype(np.float32)

    wav_dev = jnp.asarray(wav)
    y_spec = pad_spec(model._spec(wav_dev))
    cond = [y_spec]

    @jax.jit
    def run_sampler(params, y_spec, rng):
        sample, _ = model.sample_spec(
            params, y_spec, rng, cond, sampler_type="pc", N=N_STEPS
        )
        return sample

    @jax.jit
    def run_full(params, wav, rng):
        """wav [B, L] -> enhanced wav [B, L]: the whole serving path."""
        spec = pad_spec(model._spec(wav))
        sample, _ = model.sample_spec(
            params, spec, rng, [spec], sampler_type="pc", N=N_STEPS
        )
        return model._inv_spec(sample, length)

    def timed(fn, *args, readback):
        rng = jax.random.PRNGKey(1)
        out = fn(*args, rng)
        np.asarray(out)  # compile + warmup
        times = []
        for _ in range(REPS):
            rng, sub = jax.random.split(rng)
            t0 = time.perf_counter()
            out = fn(*args, sub)
            # device->host transfer: full waveform for the wav->wav path
            # (the user needs the audio on host), scalar readback otherwise
            # (block_until_ready alone can return early on axon)
            if readback == "full":
                np.asarray(out)
            else:
                float(jnp.sum(jnp.abs(out)))
            times.append(time.perf_counter() - t0)
        return sorted(times)[len(times) // 2]

    audio_s = BATCH * AUDIO_SECONDS
    wall_full = timed(run_full, params, wav_dev, readback="full")
    wall_sampler = timed(run_sampler, params, y_spec, readback="scalar")
    throughput = audio_s / wall_full  # == RTF per chip for one stream

    # MFU vs the XLA cost model: flops of the whole compiled wav->wav
    # program (30 network evals + front-end/iSTFT) over the measured wall,
    # against the v5e bf16 peak (197 TFLOP/s). Falls back to the measured
    # 6.46 TFLOP/forward cost model (BASELINE.md speed-of-light analysis)
    # if cost_analysis is unavailable on this backend.
    V5E_PEAK_FLOPS = 197e12
    try:
        ca = (
            run_full.lower(params, wav_dev, jax.random.PRNGKey(1))
            .compile()
            .cost_analysis()
        )
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        total_flops = float(ca["flops"])
    except Exception:
        total_flops = N_STEPS * BATCH * 6.46e12 * (AUDIO_SECONDS / 10.0)
    mfu = total_flops / wall_full / V5E_PEAK_FLOPS

    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_s_per_chip_30step_sgmse_large",
                "value": round(throughput, 3),
                "unit": "audio-s/s",
                "vs_baseline": round(throughput / TARGET_RTF, 4),
                "sampler_only_audio_s_per_s": round(audio_s / wall_sampler, 3),
                "mfu": round(mfu, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
