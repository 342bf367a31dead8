"""Streaming CSMGAN latency benchmark (single-stream, chunked, one chip).

The reference only self-tests CSMGAN offline on CPU (reference:
GAN/generator/CSMGAN/generator5_24k.py:764-788, RTF over 100 runs); this
measures the actual streaming runtime (use_tpu.models.gan.csmgan.CSMGANStream)
on TPU: per-chunk wall latency of the full-size 14.9M-param generator at
several chunk sizes, the implied real-time factor, and the end-to-end
algorithmic latency (chunk + one hop of STFT lookahead).

Per-chunk wall time through the axon tunnel includes a ~40 ms dispatch RTT
(see BASELINE.md round-3 measurement note), so besides the single-dispatch
latency we also time `--inner N` chunks chained inside one jit via lax.scan —
the device-side cost per chunk a co-located caller would see.

Usage: python scripts/bench_stream_csmgan.py [--chunks 2 4 8] [--reps 20]
Prints one JSON line per chunk size.
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
    ap.add_argument("--chunks", type=int, nargs="*", default=[2, 4, 8])
    ap.add_argument("--batch", type=int, default=1,
                    help="concurrent streams per session (multi-stream "
                         "serving: one step advances all of them)")
    ap.add_argument("--reps", type=int, default=20)
    ap.add_argument("--inner", type=int, default=10)
    ap.add_argument("--seconds", type=float, default=4.0)
    args = ap.parse_args()

    from use_tpu.models.gan.csmgan import CSMGANStream, CSMGANWrapper

    wrapper = CSMGANWrapper()  # shipping defaults: 14.9M params, 480 bins
    params = wrapper.init_params(jax.random.PRNGKey(0))
    sr = wrapper.feature.sampling_rate
    hop = wrapper.feature.hop_length
    rng = np.random.default_rng(0)

    for k in args.chunks:
        sess = CSMGANStream(wrapper, params, batch_size=args.batch, chunk_frames=k)
        chunk_s = k * hop / sr
        n_chunks = max(int(args.seconds * sr / (k * hop)),
                       args.reps + 1 + args.inner)
        wav = 0.1 * rng.standard_normal(
            (args.batch, n_chunks * k * hop)
        ).astype(np.float32)

        # warm up (compiles the step) and prime the session state
        out = sess.step(wav[:, : k * hop])
        float(jnp.sum(jnp.abs(out)))

        # single-dispatch latency: one step per call (includes tunnel RTT)
        times = []
        for i in range(1, min(args.reps + 1, n_chunks)):
            c = jnp.asarray(wav[:, i * k * hop : (i + 1) * k * hop])
            t0 = time.perf_counter()
            out = sess.step(c)
            float(jnp.sum(jnp.abs(out)))  # force readback
            times.append(time.perf_counter() - t0)
        lat = sorted(times)[len(times) // 2]

        # device-side per-chunk cost: `inner` chunks chained in one jit.
        # The session has consumed chunks [0, n_used) by now — the scan
        # continues from its CURRENT state with the NEXT chunks, so the
        # replayed state/data combination is a physically consistent stream
        # (ADVICE r3: scanning chunk 0 against a post-warm-up state was not).
        n_used = min(args.reps + 1, n_chunks)
        state0 = sess.state
        step = sess._step

        @jax.jit
        def run_scan(params, state, chunks):
            def body(st, c):
                st, emit = step(params, st, c)
                return st, jnp.sum(jnp.abs(emit))

            return jax.lax.scan(body, state, chunks)

        chunks = jnp.asarray(
            wav[:, n_used * k * hop : (n_used + args.inner) * k * hop]
            .reshape(args.batch, args.inner, k * hop)
        ).transpose(1, 0, 2)
        _, sums = run_scan(params, state0, chunks)
        float(jnp.sum(sums))
        t_in = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, sums = run_scan(params, state0, chunks)
            float(jnp.sum(sums))
            t_in.append(time.perf_counter() - t0)
        dev_chunk = sorted(t_in)[1] / args.inner

        print(json.dumps({
            "chunk_frames": k,
            "streams": args.batch,
            "chunk_ms": round(chunk_s * 1e3, 1),
            "dispatch_latency_ms": round(lat * 1e3, 2),
            "device_chunk_ms": round(dev_chunk * 1e3, 2),
            "rtf_x_realtime": round(args.batch * chunk_s / dev_chunk, 1),
            "algorithmic_latency_ms": round((k + 1) * hop / sr * 1e3, 1),
            "realtime_ok": bool(lat < chunk_s),
        }))


if __name__ == "__main__":
    main()
