"""Profile the ncsnpplarge forward / sampler on the attached TPU.

Captures a jax.profiler trace of a few score-network forwards (or the full
30-step sampler with --sampler) at the serving configuration (batch 8, bf16,
10 s utterance) and prints the top XLA ops by device self-time, grouped by
fusion category — the TPU analog of the reference's Lightning
`profiler: "pytorch"` preset (configs/debug/profiler.yaml).

Usage: python scripts/profile_forward.py [--sampler] [--batch 8] [--trace-dir DIR]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def hlo_op_names(hlo_text: str) -> dict:
    """instruction name -> op_name metadata, from compiled HLO text.

    Lets the trace summary attribute opaque 'fusion.N' events to model layers
    (only valid for the HLO of the same process's compile)."""
    mapping = {}
    for line in hlo_text.splitlines():
        m = re.search(r"%([\w.\-]+) = ", line)
        if not m:
            continue
        om = re.search(r'op_name="([^"]+)"', line)
        if om:
            mapping[m.group(1)] = om.group(1)
    return mapping


def summarize_trace(trace_dir: str, top: int = 25, op_names: dict | None = None) -> None:
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        print(f"no trace files under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        trace = json.load(f)

    # device-side complete events, keyed by TensorFlow-op/XLA-op name
    device_pids = set()
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "XLA Op" in name:
                device_pids.add(ev["pid"])

    totals: dict = collections.Counter()
    counts: dict = collections.Counter()
    total_us = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0)
        name = ev.get("name", "?")
        # strip uniquifying suffixes: fusion.123 -> fusion
        base = re.sub(r"[.\d]+$", "", name)
        totals[name] += dur
        counts[name] += 1
        total_us += dur

    if not totals:
        print("no device events found; dumping process names:")
        for ev in trace.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                print("  pid", ev["pid"], ev.get("args"))
        return

    print(f"trace: {path}")
    print(f"total device time: {total_us/1e3:.2f} ms over {sum(counts.values())} events")
    print(f"{'op':<40} {'ms':>9} {'%':>6} {'n':>6}  layer")
    op_names = op_names or {}
    for name, us in totals.most_common(top):
        layer = op_names.get(name, "")
        # strip the jit(...)/ prefix for readability
        layer = re.sub(r"^jit\([^)]*\)/", "", layer)
        print(
            f"{name[:40]:<40} {us/1e3:9.2f} {100*us/total_us:6.2f}"
            f" {counts[name]:6d}  {layer[:70]}"
        )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sampler", action="store_true", help="profile the 30-step sampler")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--seconds", type=float, default=10.0)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--trace-dir", default=None)
    ap.add_argument("--summarize-only", default=None, help="just parse an existing trace dir")
    ap.add_argument("--quant", default="none", help="conv quantization mode (none|int8)")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    if args.summarize_only:
        summarize_trace(args.summarize_only, args.top)
        return

    import jax
    import jax.numpy as jnp
    import numpy as np

    from use_tpu.models.sgmse.score_model import sgmse_large
    from use_tpu.ops import pad_spec

    model = sgmse_large(backbone_kwargs=dict(dtype="bfloat16", quant=args.quant))
    params = model.cast_params_for_inference(
        model.init_params(jax.random.PRNGKey(0))
    )
    wav = 0.1 * np.random.default_rng(0).standard_normal(
        (args.batch, int(args.seconds * 24000))
    ).astype(np.float32)
    y_spec = pad_spec(model._spec(jnp.asarray(wav)))
    cond = [y_spec]

    if args.sampler:
        @jax.jit
        def run(params, y_spec, rng):
            out, _ = model.sample_spec(
                params, y_spec, rng, cond, sampler_type="pc", N=args.steps
            )
            return out
        compiled = run.lower(params, y_spec, jax.random.PRNGKey(1)).compile()
        fn = lambda r: run(params, y_spec, r)
    else:
        x = y_spec
        t = jnp.full((args.batch,), 0.5, jnp.float32)

        @jax.jit
        def run(params, x, t):
            return model.forward_score(params, x, t, cond)
        compiled = run.lower(params, x, t).compile()
        fn = lambda r: run(params, x, t)

    op_names = hlo_op_names(compiled.as_text())

    rng = jax.random.PRNGKey(1)
    out = fn(rng)  # compile + warmup (cache hit from the explicit lower)
    float(jnp.sum(jnp.abs(out)))

    trace_dir = args.trace_dir or tempfile.mkdtemp(prefix="use_tpu_trace_")
    jax.profiler.start_trace(trace_dir)
    for _ in range(args.reps):
        rng, sub = jax.random.split(rng)
        out = fn(sub)
    float(jnp.sum(jnp.abs(out)))
    jax.profiler.stop_trace()
    print(f"trace written to {trace_dir}")
    summarize_trace(trace_dir, args.top, op_names)


if __name__ == "__main__":
    main()
