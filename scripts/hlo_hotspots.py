"""Correlate profiled fusion names with their HLO bodies.

Compiles the serving forward (same setup as scripts/profile_forward.py),
prints each requested fusion's root + a shape/op summary so 'fusion.N'
entries in the profile can be attributed to model layers. Run after
profile_forward.py; pass the hot fusion names.

Usage: python scripts/hlo_hotspots.py fusion.10 fusion.220 convert_multiply_fusion.7 ...
"""
from __future__ import annotations

import re
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]

    import jax
    import jax.numpy as jnp
    import numpy as np

    from use_tpu.models.sgmse.score_model import sgmse_large
    from use_tpu.ops import pad_spec

    model = sgmse_large(backbone_kwargs=dict(dtype="bfloat16"))
    params = model.cast_params_for_inference(
        model.init_params(jax.random.PRNGKey(0))
    )
    batch = int(os.environ.get("USE_BENCH_BATCH", "8"))
    wav = 0.1 * np.random.default_rng(0).standard_normal(
        (batch, 240000)
    ).astype(np.float32)
    y_spec = pad_spec(model._spec(jnp.asarray(wav)))
    cond = [y_spec]
    t = jnp.full((batch,), 0.5, jnp.float32)

    def run(params, x, t):
        return model.forward_score(params, x, t, cond)

    compiled = jax.jit(run).lower(params, y_spec, t).compile()
    txt = compiled.as_text()

    # index: fusion name -> its computation body
    comps: dict[str, list[str]] = {}
    cur = None
    for line in txt.splitlines():
        m = re.match(r"%?([\w.\-]+)\s*(\([^)]*\))? \{", line.strip())
        if line.rstrip().endswith("{") and ("fused_computation" in line or m):
            cur = line.strip().split()[0].lstrip("%")
            comps[cur] = []
        elif cur is not None:
            if line.strip() == "}":
                cur = None
            else:
                comps[cur].append(line.rstrip())

    # map fusion instruction name -> called computation + metadata
    for name in names:
        pat = re.compile(
            rf"%?{re.escape(name)} = (\S+) fusion\((.*?)\), kind=(\S+), calls=%?([\w.\-]+)(.*)"
        )
        found = False
        for line in txt.splitlines():
            mm = pat.search(line)
            if mm:
                found = True
                shape, _args, kind, callee, rest = mm.groups()
                meta = re.search(r'op_name="([^"]+)"', line)
                print(f"== {name}: {kind} -> {shape}")
                if meta:
                    print(f"   op_name: {meta.group(1)}")
                body = comps.get(callee, [])
                opcount: dict[str, int] = {}
                for bl in body:
                    m2 = re.search(r"= \S+ ([\w\-]+)\(", bl)
                    if m2:
                        opcount[m2.group(1)] = opcount.get(m2.group(1), 0) + 1
                print(f"   body ({len(body)} lines): {sorted(opcount.items(), key=lambda kv: -kv[1])[:10]}")
                # print any convolution / dot lines fully
                for bl in body:
                    if "convolution" in bl or " dot(" in bl:
                        print("   " + bl.strip()[:220])
                break
        if not found:
            # maybe it's a plain instruction (convert_element_type.24)
            for line in txt.splitlines():
                if re.search(rf"%?{re.escape(name)} = ", line):
                    meta = re.search(r'op_name="([^"]+)"', line)
                    print(f"== {name}: {line.strip()[:200]}")
                    if meta:
                        print(f"   op_name: {meta.group(1)}")
                    found = True
                    break
        if not found:
            print(f"== {name}: NOT FOUND in optimized HLO")


if __name__ == "__main__":
    main()
