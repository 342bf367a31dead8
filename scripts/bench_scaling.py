"""Data-parallel scaling benchmark for the SGMSE train step.

Measures per-step wall time of the jitted score-matching train step at
1, 2, 4, ... devices with a fixed per-device batch (weak scaling) and
reports efficiency = t(1) / t(n). On a real multi-chip TPU slice the
gradient all-reduce rides ICI; on a single-chip/dev box the script falls
back to a virtual CPU mesh (XLA_FLAGS=--xla_force_host_platform_device_count)
— there the numbers validate the sharded program end-to-end (the JAX analog
of the reference's configs/trainer/ddp_sim.yaml CPU DDP simulation) but all
virtual devices share the same host cores, so "efficiency" reflects host
oversubscription, not ICI.

Usage:
    python scripts/bench_scaling.py [--devices 8] [--backbone ncsnpp6M]
        [--frames 64] [--batch-per-device 1] [--steps 5]

Prints one JSON line per mesh size:
    {"devices": n, "step_ms": ..., "efficiency": ...}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--backbone", default="ncsnpp6M")
    ap.add_argument("--frames", type=int, default=64)
    ap.add_argument("--batch-per-device", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    # Fall back to virtual CPU devices when the real backend is single-chip.
    # Must happen before jax initializes its backends.
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={args.devices}"
        ).strip()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from use_tpu.engine import optim
    from use_tpu.engine.state import TrainState
    from use_tpu.engine.train import make_sgmse_train_step
    from use_tpu.models.sgmse.score_model import ScoreModel
    from use_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

    devices = jax.devices()
    if len(devices) < args.devices:
        devices = jax.devices("cpu")
    devices = devices[: args.devices]
    virtual = devices[0].platform == "cpu"

    hop = 128
    model = ScoreModel(
        backbone=args.backbone,
        n_fft=510,
        hop_length=hop,
        num_frames=args.frames,
        condition="noisy",
        sde_input="noisy",
    )
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optim.adam(5e-4, weight_decay=1e-7, grad_clip=100.0)
    length = (args.frames - 1) * hop

    t1 = None
    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= len(devices)]
    for n in sizes:
        mesh = make_mesh(data=n, model=1, devices=devices[:n])
        bsh = batch_sharding(mesh)
        rep = replicated(mesh)
        with jax.sharding.use_mesh(mesh) if hasattr(jax.sharding, "use_mesh") else mesh:
            state = TrainState.create(
                jax.device_put(params, rep), tx, ema_decay=0.0
            )
            step_fn = make_sgmse_train_step(model, tx, accum=1, donate=True)
            b = args.batch_per_device * n
            rng_np = np.random.default_rng(0)
            batch = {
                "clean": jax.device_put(
                    rng_np.standard_normal((b, length)).astype(np.float32), bsh
                ),
                "perturbed": jax.device_put(
                    rng_np.standard_normal((b, length)).astype(np.float32), bsh
                ),
            }
            rng = jax.random.PRNGKey(1)
            state, m = step_fn(state, batch, rng)  # compile + warmup
            jax.block_until_ready(m)
            times = []
            for i in range(args.steps):
                rng, sub = jax.random.split(rng)
                t0 = time.perf_counter()
                state, m = step_fn(state, batch, sub)
                float(m["loss_Score"])  # force readback
                times.append(time.perf_counter() - t0)
            step_ms = 1e3 * sorted(times)[len(times) // 2]
            if t1 is None:
                t1 = step_ms
            print(
                json.dumps(
                    {
                        "devices": n,
                        "virtual_cpu_mesh": virtual,
                        "global_batch": b,
                        "step_ms": round(step_ms, 2),
                        "weak_scaling_efficiency": round(t1 / step_ms, 3),
                    }
                )
            )
            sys.stdout.flush()


if __name__ == "__main__":
    main()
