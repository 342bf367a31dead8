"""Batch-1 (single-utterance) latency treatments (VERDICT r3 item 3).

Round-3 measured 2.40 s to enhance one 10 s clip on one chip — a 1.69x
penalty vs batch-8 serving, because XLA space-to-batch-rewrites the batch-1
convolutions. This bench measures the candidate treatments that fit ONE
chip (the reference's interactive enhance() case, model.py:396-400):

  batch-1        the baseline: one clip, one sampler run
  dup-pad K      duplicate the clip to batch K: if the batched step is
                 sublinear enough (escaping space-to-batch), the wall clock
                 for the ONE real clip drops even though K-1 lanes are waste
  chunk K        split the clip's frames into K chunks (pad to %64) and
                 batch the chunks: same total FLOPs, batched MXU path;
                 output differs near chunk boundaries (measured here as
                 SI-SDR of chunked vs full output)

Prints one JSON line per treatment. Run AFTER the suite (2-vCPU host).
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

N_STEPS = 30
SR = 24000
DTYPE = "bfloat16"


def timed(fn, *args, reps=3):
    rng = jax.random.PRNGKey(1)
    out = fn(*args, rng)
    jax.tree.map(np.asarray, out)  # compile + warmup
    times = []
    for _ in range(reps):
        rng, sub = jax.random.split(rng)
        t0 = time.perf_counter()
        out = fn(*args, sub)
        jax.tree.map(np.asarray, out)  # full host readback (serving cost)
        times.append(time.perf_counter() - t0)
    return sorted(times)[len(times) // 2]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--dups", type=int, nargs="*", default=[2, 4])
    ap.add_argument("--chunks", type=int, nargs="*", default=[4])
    args = ap.parse_args()

    from use_tpu.models.sgmse.score_model import sgmse_large
    from use_tpu.ops import pad_spec
    from use_tpu.utils.metrics import si_sdr

    model = sgmse_large(backbone_kwargs=dict(dtype=DTYPE))
    params = model.cast_params_for_inference(
        model.init_params(jax.random.PRNGKey(0))
    )
    length = int(args.seconds * SR)
    wav = 0.1 * np.random.default_rng(0).standard_normal((1, length))
    wav = jnp.asarray(wav.astype(np.float32))

    def make_full(batch):
        @jax.jit
        def run(params, w, rng):
            spec = pad_spec(model._spec(w))
            sample, _ = model.sample_spec(
                params, spec, rng, [spec], sampler_type="pc", N=N_STEPS
            )
            return model._inv_spec(sample, length)
        return run

    # baseline: batch 1
    run1 = make_full(1)
    t1 = timed(run1, params, wav)
    base = np.asarray(run1(params, wav, jax.random.PRNGKey(1)))
    print(json.dumps({"treatment": "batch1", "latency_s": round(t1, 3),
                      "audio_s_per_s": round(args.seconds / t1, 2)}))

    # dup-pad: duplicate the utterance to batch K, read back row 0
    for k in args.dups:
        runk = make_full(k)
        wk = jnp.tile(wav, (k, 1))

        @jax.jit
        def run_dup(params, w, rng, _runk=runk):
            return _runk(params, w, rng)[:1]

        tk = timed(run_dup, params, wk)
        print(json.dumps({
            "treatment": f"dup_pad_{k}", "latency_s": round(tk, 3),
            "audio_s_per_s": round(args.seconds / tk, 2),
            "speedup_vs_batch1": round(t1 / tk, 3),
        }))

    # chunked frames: split the clip into K equal time chunks, batch them
    for k in args.chunks:
        chunk_len = int(np.ceil(length / k))
        pad = chunk_len * k - length
        wav_p = jnp.pad(wav, ((0, 0), (0, pad)))
        chunks = wav_p.reshape(k, chunk_len)

        @jax.jit
        def run_chunk(params, c, rng):
            spec = pad_spec(model._spec(c))
            sample, _ = model.sample_spec(
                params, spec, rng, [spec], sampler_type="pc", N=N_STEPS
            )
            return model._inv_spec(sample, chunk_len)

        tk = timed(run_chunk, params, chunks)
        out = np.asarray(
            run_chunk(params, chunks, jax.random.PRNGKey(1))
        ).reshape(1, -1)[:, :length]
        quality = si_sdr(base[0], out[0])
        print(json.dumps({
            "treatment": f"chunk_{k}", "latency_s": round(tk, 3),
            "audio_s_per_s": round(args.seconds / tk, 2),
            "speedup_vs_batch1": round(t1 / tk, 3),
            "si_sdr_vs_full_db": round(float(quality), 2),
        }))


if __name__ == "__main__":
    main()
