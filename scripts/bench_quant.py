"""Measure the int8 serving path: 30-step sampler speed + deviation vs bf16.

Runs SGMSE_Large sampling twice on the same input/rng — once with the bf16
conv path, once with quant='int8' (use_tpu/ops/qconv.py) — and reports
per-batch step time plus the SI-SDR of the int8 waveform against the bf16
waveform (the serving-precision deviation; bf16-vs-fp32 is the comparison
noise floor at ~30+ dB).

Usage: python scripts/bench_quant.py [--batch 8] [--seconds 10] [--n 30]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def si_sdr(ref: np.ndarray, est: np.ndarray) -> float:
    ref = ref - ref.mean(axis=-1, keepdims=True)
    est = est - est.mean(axis=-1, keepdims=True)
    s = (np.sum(est * ref, -1, keepdims=True) /
         np.maximum(np.sum(ref * ref, -1, keepdims=True), 1e-12)) * ref
    e = est - s
    return float(np.mean(10 * np.log10(
        np.maximum(np.sum(s * s, -1), 1e-12) /
        np.maximum(np.sum(e * e, -1), 1e-12))))


def run_variant(quant: str, wav: np.ndarray, n_steps: int):
    from use_tpu.models.sgmse.score_model import sgmse_large
    from use_tpu.ops import pad_spec

    model = sgmse_large(backbone_kwargs=dict(dtype="bfloat16", quant=quant))
    params = model.init_params(jax.random.PRNGKey(0))
    params = model.cast_params_for_inference(params)
    y_spec = pad_spec(model._spec(jnp.asarray(wav)))

    @jax.jit
    def run(params, y_spec, rng):
        sample, _ = model.sample_spec(
            params, y_spec, rng, [y_spec], sampler_type="pc", N=n_steps
        )
        return sample

    rng = jax.random.PRNGKey(1)
    out = np.asarray(run(params, y_spec, rng))  # compile+warm
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(params, y_spec, rng))
        ts.append(time.perf_counter() - t0)
    t = sorted(ts)[1]
    wav_out = np.asarray(model._inv_spec(jnp.asarray(out), wav.shape[-1]))
    return t, wav_out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--n", type=int, default=30)
    ap.add_argument("--quants", nargs="*", default=["int8"],
                    help="quant variants vs bf16 (int8, int8_pallas)")
    args = ap.parse_args()

    sr = 24000
    length = int(args.seconds * sr)
    wav = (0.1 * np.random.default_rng(0).standard_normal(
        (args.batch, length))).astype(np.float32)
    audio_s = args.batch * args.seconds

    t_bf16, out_bf16 = run_variant("none", wav, args.n)
    print(f"bf16 : {t_bf16*1e3:9.1f} ms  {audio_s/t_bf16:6.2f} audio-s/s",
          flush=True)
    for quant in args.quants:
        t_q, out_q = run_variant(quant, wav, args.n)
        print(f"{quant:12s}: {t_q*1e3:9.1f} ms  {audio_s/t_q:6.2f} audio-s/s  "
              f"({t_bf16/t_q:.2f}x)  "
              f"si-sdr vs bf16: {si_sdr(out_bf16, out_q):6.2f} dB",
              flush=True)


if __name__ == "__main__":
    main()
