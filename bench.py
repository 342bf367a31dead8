"""Headline benchmark: audio-seconds/s per chip, 30-step reverse-SDE sampling.

Runs the shipping SGMSE_Large configuration (ncsnpplarge ~60M score network,
n_fft=1022, hop=160) through the fused lax.scan PC sampler
(predictor=reverse_diffusion, corrector=none -> NFE=30) on one chip and
reports real-time throughput. The reference publishes no numbers
(BASELINE.md); vs_baseline is measured against this repo's north-star target
of 50x real time per v5e chip (BASELINE.json). NOTE: 50x exceeds the v5e
roofline for this model/NFE — 30-step sampling costs 19.4 TFLOP per
audio-second, capping a 197-TFLOP/s chip at ~10 audio-s/s; see the
speed-of-light analysis in BASELINE.md. Serving batch is 8: a real batch
stops XLA space-to-batching the batch-1 convolutions (~1.7x per clip).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
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

    y_spec = pad_spec(model._spec(jnp.asarray(wav)))
    cond = [y_spec]

    @jax.jit
    def run(params, y_spec, rng):
        sample, _ = model.sample_spec(
            params, y_spec, rng, cond, sampler_type="pc", N=N_STEPS
        )
        return sample

    rng = jax.random.PRNGKey(1)
    out = run(params, y_spec, rng)
    float(jnp.sum(jnp.abs(out)))  # compile + warmup

    times = []
    for i in range(REPS):
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        out = run(params, y_spec, sub)
        # force a device->host readback: on the axon runtime
        # block_until_ready() alone can return before execution finishes
        float(jnp.sum(jnp.abs(out)))
        times.append(time.perf_counter() - t0)

    wall = sorted(times)[len(times) // 2]
    audio_s = BATCH * AUDIO_SECONDS
    throughput = audio_s / wall  # == RTF per chip for one stream

    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_s_per_chip_30step_sgmse_large",
                "value": round(throughput, 3),
                "unit": "audio-s/s",
                "vs_baseline": round(throughput / TARGET_RTF, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
