"""Tune the learning quality gates for the formant-speech probes.

The round-4 gates were calibrated on stationary harmonic-comb probes;
formant-synthesized pseudo-speech (VERDICT r4 item 6) is harder — more
distinct vowel/f0 combinations to cover, and transient glottal structure
destabilizes the tiny-GAN D/G balance. This one-off study sweeps the gate
hyperparameters (training pool size, steps, D learning rate) and prints
the measured SI-SDR gains so tests/test_learning.py and
scripts/soak_train_tpu.py can assert margins that reflect the probes.

Usage: python scripts/probe_gate_study.py --family sgmse --pool 12 --steps 600
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 24000


class PoolDM:
    def __init__(self, length, pool, steps_per_epoch, snr_db, batch=4):
        from use_tpu.data.synth_speech import synth_pair

        self.local_batch = batch
        self._steps = steps_per_epoch
        self._batch = batch
        pairs = [synth_pair(length, s, snr_db=snr_db, sr=SR) for s in range(pool)]
        self._clean = np.stack([p[0] for p in pairs])
        self._noisy = np.stack([p[1] for p in pairs])
        self._P = pool

    def train_dataloader(self):
        idx = 0
        for _ in range(self._steps):
            sel = [(idx + j) % self._P for j in range(self._batch)]
            idx = (idx + self._batch) % self._P
            yield {"clean": self._clean[sel], "perturbed": self._noisy[sel]}

    def val_dataloader(self):
        yield {"clean": self._clean[:4], "perturbed": self._noisy[:4]}


def heldout(length, n, snr_db):
    from use_tpu.data.synth_speech import synth_pair

    return [
        {"clean": c, "perturbed": p}
        for c, p in (synth_pair(length, 100 + s, snr_db=snr_db, sr=SR)
                     for s in range(n))
    ]


def run_sgmse(pool, steps, snr_db, lr, seed=0):
    import jax

    from use_tpu.engine.evaluate import evaluate_model
    from use_tpu.engine.loop import fit_sgmse
    from use_tpu.models.sgmse.score_model import ScoreModel
    from use_tpu.utils.metrics import si_sdr

    hop, n_fft, frames = 32, 126, 32
    length = (frames - 1) * hop
    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition="noisy", sde_input="noisy",
        n_fft=n_fft, hop_length=hop, num_frames=frames,
        backbone_kwargs=dict(nf=24, ch_mult=(1, 1), num_res_blocks=1),
    )
    epochs = max(1, steps // 50)
    res = fit_sgmse(
        model, PoolDM(length, pool, 50, snr_db), lr=lr,
        accumulate_grad_batches=1, max_epochs=epochs, seed=seed, mesh=None,
        scheduler={"step_size": 1000, "gamma": 1.0},
    )
    pairs = heldout(length, 2, snr_db)

    def enhance_fn(noisy, sub):
        out = model.sample(res.state.params, {"perturbed": noisy[None]}, sub, N=30)
        return np.asarray(out["enhanced"])[0]

    ev = evaluate_model(enhance_fn, pairs, jax.random.PRNGKey(1), num_figures=0)
    noisy_sdr = float(np.mean([si_sdr(p["clean"], p["perturbed"]) for p in pairs]))
    print(json.dumps({
        "family": "sgmse", "pool": pool, "steps": steps, "snr_db": snr_db,
        "lr": lr,
        "si_sdr_noisy": round(noisy_sdr, 2),
        "si_sdr_enhanced": round(ev["metrics"]["si_sdr"], 2),
        "gain_db": round(ev["metrics"]["si_sdr"] - noisy_sdr, 2),
        "final_train_loss": round(res.history[-1]["train/loss_Score"], 3),
    }), flush=True)


def run_lsgan(pool, steps, snr_db, d_lr, nf, alpha_feat, g_lr=2e-3, seed=0):
    import flax.linen as fnn
    import jax

    from use_tpu.engine.evaluate import evaluate_model
    from use_tpu.engine.loop import fit_lsgan
    from use_tpu.models.gan import losses
    from use_tpu.models.gan.discriminators import MultiPeriodDiscriminator
    from use_tpu.models.gan.generator import NCSNPPWrapper
    from use_tpu.models.gan.lsgan import LSGAN
    from use_tpu.utils.metrics import si_sdr

    class TinyMPD(fnn.Module):
        @fnn.compact
        def __call__(self, x):
            logits, fmaps = MultiPeriodDiscriminator(periods=(2, 3), name="MPD")(x)
            return [logits], [fmaps]

    length = (32 - 1) * 32
    gen = NCSNPPWrapper(
        n_fft=126, hop_length=32, num_frames=32,
        backbone_kwargs=dict(nf=nf, ch_mult=(1, 1), num_res_blocks=1),
    )
    gan = LSGAN(
        generator=gen, discriminator=TinyMPD(),
        g_loss_cfg=losses.HifiganGLossConfig(
            sampling_rate=SR, alpha_wav_l1=1.0, alpha_adv_feat=alpha_feat,
        ),
    )
    epochs = max(1, steps // 50)
    res = fit_lsgan(
        gan, PoolDM(length, pool, 50, snr_db), g_lr=g_lr, d_lr=d_lr,
        accumulate_grad_batches=1, max_epochs=epochs, seed=seed, mesh=None,
        scheduler={"step_size": 1000, "gamma": 1.0},
    )
    pairs = heldout(length, 2, snr_db)

    def enhance_fn(noisy, sub):
        out = gan.enhance(res.state.g.params, {"perturbed": noisy[None]})
        return np.asarray(out["fake"])[0]

    ev = evaluate_model(enhance_fn, pairs, jax.random.PRNGKey(1), num_figures=0)
    noisy_sdr = float(np.mean([si_sdr(p["clean"], p["perturbed"]) for p in pairs]))
    print(json.dumps({
        "family": "lsgan", "pool": pool, "steps": steps, "snr_db": snr_db,
        "d_lr": d_lr, "nf": nf, "alpha_feat": alpha_feat, "g_lr": g_lr,
        "seed": seed,
        "si_sdr_noisy": round(noisy_sdr, 2),
        "si_sdr_enhanced": round(ev["metrics"]["si_sdr"], 2),
        "gain_db": round(ev["metrics"]["si_sdr"] - noisy_sdr, 2),
        "final_train_G": round(res.history[-1]["train/loss_G"], 3),
        "final_train_D": round(res.history[-1]["train/loss_D"], 5),
        "final_val_G": round(res.history[-1].get("val/loss_G", np.nan), 3),
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=("sgmse", "lsgan"), required=True)
    ap.add_argument("--pool", type=int, default=12)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--snr-db", type=float, default=None)
    ap.add_argument("--lr", type=float, default=2e-3)
    ap.add_argument("--d-lr", type=float, default=1e-4)
    ap.add_argument("--nf", type=int, default=16)
    ap.add_argument("--alpha-feat", type=float, default=10.0)
    ap.add_argument("--steps-per-epoch", type=int, default=50)
    ap.add_argument("--g-lr", type=float, default=2e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend via the config API — under "
                         "axon the JAX_PLATFORMS env var is NOT honored and "
                         "the chip is grabbed silently")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    if args.family == "sgmse":
        run_sgmse(args.pool, args.steps, args.snr_db or 5.0, args.lr,
                  seed=args.seed)
    else:
        run_lsgan(args.pool, args.steps, args.snr_db or 0.0, args.d_lr,
                  args.nf, args.alpha_feat, g_lr=args.g_lr, seed=args.seed)


if __name__ == "__main__":
    main()
