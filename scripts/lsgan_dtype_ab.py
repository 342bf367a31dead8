"""Shipping-scale f32-vs-bf16 LSGAN quality A/B on the chip (VERDICT r4#4).

The shipping LSGAN recipe (reference configs/model/LSGAN.yaml constants:
batch 4, f32) cannot train on one v5e as written — f32 batch 4 wants
18.6 GB of the 15.75 GB HBM (BASELINE.md round-2). Two single-chip
deployments exist: (A) keep f32 and trade micro-batch for accumulation
(micro 2 x accum 2), or (B) bf16 G compute at batch 4 (fits, +66%
throughput). This script runs the DECIDING experiment: matched soaks of
the exact shipping model (full NCSNPP G at 1022/160/480 frames + complete
24k_MVD discriminator bank + WavSpecConvergence criterion) on identical
formant-synthesized speech data, same seed, same effective batch and
effective step count, comparing val/loss_G trajectories and held-out
enhancement quality (SI-SDR + native ESTOI of the G output).

The outcome decides LSGAN.yaml's single-chip default; the measured rows
are recorded in BASELINE.md.

Usage: python scripts/lsgan_dtype_ab.py [--epochs 8] [--steps 25]
       [--arm f32|bf16|both]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 24000
CLIP = 479 * 160  # the shipping 480-frame crop (~3.19 s)


class _PairsDM:
    """Fixed pseudo-speech pool served in a deterministic order so every
    arm sees the SAME 4 clips per effective step regardless of its
    micro-batch/accumulation split."""

    def __init__(self, pool, micro, steps_per_epoch, accum):
        self.local_batch = micro
        self._micro = micro
        self._n_micro = steps_per_epoch * accum
        self._clean = np.stack([p[0] for p in pool])
        self._noisy = np.stack([p[1] for p in pool])
        self._P = len(pool)

    def train_dataloader(self):
        idx = 0
        for _ in range(self._n_micro):
            sel = [(idx + j) % self._P for j in range(self._micro)]
            idx = (idx + self._micro) % self._P
            yield {"clean": self._clean[sel], "perturbed": self._noisy[sel]}

    def val_dataloader(self):
        yield {"clean": self._clean[:4], "perturbed": self._noisy[:4]}


def run_arm(name, dtype, micro, accum, pool, heldout, epochs, steps):
    import jax

    from use_tpu.cli.main import _build_model
    from use_tpu.config.config import load_config
    from use_tpu.engine.loop import fit_lsgan
    from use_tpu.utils.metrics import estoi, si_sdr

    overrides = [f"model.generator.backbone_kwargs.dtype={dtype}"]
    cfg = load_config("LSGAN", overrides)
    gan = _build_model(cfg)
    dm = _PairsDM(pool, micro, steps, accum)
    t0 = time.time()
    res = fit_lsgan(
        gan, dm, g_lr=2e-4, d_lr=1e-4, accumulate_grad_batches=accum,
        max_epochs=epochs, seed=0, mesh=None,
        scheduler={"step_size": 1000, "gamma": 1.0},
    )
    wall = time.time() - t0
    for row in res.history:
        print(json.dumps({
            "arm": name, "epoch": row["epoch"],
            "train/loss_G": round(row["train/loss_G"], 4),
            "train/loss_D": round(row["train/loss_D"], 4),
            "val/loss_G": round(row.get("val/loss_G", float("nan")), 4),
            "time_s": round(row["time_s"], 1),
        }))

    rows = []
    for c, n in heldout:
        out = gan.enhance(res.state.g.params, {"perturbed": n[None]})
        e = np.asarray(out["fake"], np.float32)[0]
        rows.append({
            "si_sdr_noisy": si_sdr(c, n),
            "si_sdr_enhanced": si_sdr(c, e),
            "estoi_noisy": estoi(c, n, SR),
            "estoi_enhanced": estoi(c, e, SR),
        })
    summary = {
        "arm": name, "dtype": dtype, "micro_batch": micro, "accum": accum,
        "effective_steps": epochs * steps,
        "wall_s": round(wall, 1),
        "train_audio_s_per_s": round(
            epochs * steps * micro * accum * CLIP / SR / wall, 2
        ),
        "final_val_loss_G": round(res.history[-1].get("val/loss_G", np.nan), 4),
        **{
            k: round(float(np.mean([r[k] for r in rows])), 3)
            for k in rows[0]
        },
    }
    summary["si_sdr_gain_db"] = round(
        summary["si_sdr_enhanced"] - summary["si_sdr_noisy"], 2
    )
    print(json.dumps(summary))
    return summary


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--steps", type=int, default=25, help="effective steps/epoch")
    ap.add_argument("--arm", choices=("f32", "bf16", "both"), default="both")
    args = ap.parse_args()

    from use_tpu.data.synth_speech import synth_pair

    import jax

    print("devices:", jax.devices())
    pool = [synth_pair(CLIP, s, snr_db=5.0, sr=SR) for s in range(8)]
    heldout = [synth_pair(CLIP, 100 + s, snr_db=5.0, sr=SR) for s in range(2)]

    out = {}
    if args.arm in ("f32", "both"):
        out["f32"] = run_arm(
            "f32", "float32", 2, 2, pool, heldout, args.epochs, args.steps
        )
    if args.arm in ("bf16", "both"):
        out["bf16"] = run_arm(
            "bf16", "bfloat16", 4, 1, pool, heldout, args.epochs, args.steps
        )
    if len(out) == 2:
        print(json.dumps({
            "decision_inputs": {
                "d_val_loss_G_bf16_minus_f32": round(
                    out["bf16"]["final_val_loss_G"] - out["f32"]["final_val_loss_G"], 4
                ),
                "d_si_sdr_gain_db": round(
                    out["bf16"]["si_sdr_gain_db"] - out["f32"]["si_sdr_gain_db"], 2
                ),
                "d_estoi": round(
                    out["bf16"]["estoi_enhanced"] - out["f32"]["estoi_enhanced"], 3
                ),
                "speedup_bf16": round(
                    out["bf16"]["train_audio_s_per_s"]
                    / out["f32"]["train_audio_s_per_s"], 2
                ),
            }
        }))


if __name__ == "__main__":
    main()
