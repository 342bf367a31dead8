"""Training soak on the attached TPU: overfit both shipping task families.

Generates a tiny synthetic clean/noise corpus, then runs real training —
the same fit_sgmse / fit_lsgan engines the CLI uses — on the device JAX
selects (the TPU under axon), asserting the losses decrease. This is the
hardware analog of tests/test_engine.py's CPU end-to-end fit (the CI suite
pins the CPU backend), mirroring the reference's overfit debug preset
(reference configs/debug/overfit.yaml).

Usage: python scripts/soak_train_tpu.py [--epochs 8] [--family sgmse|lsgan|both]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 24000


def make_corpus(root: str):
    from use_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    jsons = {}
    for kind in ("clean", "noise"):
        jp = os.path.join(root, f"{kind}.jsonl")
        with open(jp, "w") as f:
            for i in range(4):
                p = os.path.join(root, f"{kind}{i}.wav")
                # speech-ish: AM-modulated tones; noise: broadband
                t = np.arange(2 * SR) / SR
                if kind == "clean":
                    wav = 0.3 * np.sin(2 * np.pi * (120 + 40 * i) * t)
                    wav *= 0.6 + 0.4 * np.sin(2 * np.pi * 2.5 * t)
                else:
                    wav = 0.2 * rng.standard_normal(2 * SR)
                write_wav(p, wav.astype(np.float32), SR)
                f.write(json.dumps({"file_path": p, "duration": 2.0, "sample_rate": SR}) + "\n")
        jsons[kind] = jp
    return jsons


def build_dm(jsons, batch_size=4):
    from use_tpu.data.datamodule import DistortDataModule
    from use_tpu.data.distort_dataset import DistortConfig

    cfg = DistortConfig(
        clean_json_path=jsons["clean"], noise_json_path=jsons["noise"],
        speech_splice_seconds=1, reverb_use_FRA=True, min_duration_seconds=0.5,
        codecs_prob=0, packet_loss_prob=0, spectral_time_freq_holes_prob=0,
    )
    return DistortDataModule(
        train_cfg=cfg, batch_size=batch_size, num_workers=0, overfit_items=4
    )


def soak_sgmse(dm, epochs: int) -> list:
    from use_tpu.engine.loop import fit_sgmse
    from use_tpu.models.sgmse.score_model import ScoreModel

    model = ScoreModel(
        backbone="ncsnpp12M", condition="noisy", sde_input="noisy",
        n_fft=510, hop_length=128, num_frames=128,
    )
    res = fit_sgmse(model, dm, lr=1e-4, accumulate_grad_batches=1,
                    max_epochs=epochs, seed=0)
    return [row["train/loss_Score"] for row in res.history]


def soak_lsgan(dm, epochs: int) -> list:
    from use_tpu.engine.loop import fit_lsgan
    from use_tpu.models.gan.generator import NCSNPPWrapper
    from use_tpu.models.gan.lsgan import LSGAN

    gen = NCSNPPWrapper(
        n_fft=510, hop_length=128, num_frames=64,
        backbone_kwargs=dict(nf=32, ch_mult=(1, 1), num_res_blocks=1),
    )
    gan = LSGAN(generator=gen)
    res = fit_lsgan(gan, dm, g_lr=2e-4, d_lr=1e-4, accumulate_grad_batches=1,
                    max_epochs=epochs, seed=0)
    return [row["train/loss_G"] for row in res.history]


SOAK_SR = SR


def _gate_pair(length, seed, snr_db):
    rng = np.random.default_rng(seed)
    t = np.arange(length) / SR
    f0 = 150 + 60 * rng.random()
    clean = sum(
        (0.5 / k) * np.sin(2 * np.pi * k * f0 * t + rng.random() * 6.28)
        for k in range(1, 12)
    )
    clean = (0.3 * clean / np.max(np.abs(clean))).astype(np.float32)
    noise = rng.standard_normal(length).astype(np.float32)
    noise *= np.sqrt(
        np.mean(clean**2) / np.mean(noise**2) / 10 ** (snr_db / 10)
    )
    return clean, (clean + noise).astype(np.float32)


def _gate_dm(length, steps_per_epoch, snr_db):
    class DM:
        local_batch = 4

        def train_dataloader(self):
            pairs = [_gate_pair(length, s, snr_db) for s in range(4)]
            c = np.stack([p[0] for p in pairs])
            n = np.stack([p[1] for p in pairs])
            for _ in range(steps_per_epoch):
                yield {"clean": c, "perturbed": n}

        def val_dataloader(self):
            pairs = [_gate_pair(length, s, snr_db) for s in range(4)]
            yield {"clean": np.stack([p[0] for p in pairs]),
                   "perturbed": np.stack([p[1] for p in pairs])}

    return DM()


def _gate_report(tag, steps, enhance_fn, pairs, margin_db):
    import jax

    from use_tpu.engine.evaluate import evaluate_model
    from use_tpu.utils.metrics import si_sdr

    ev = evaluate_model(enhance_fn, pairs, jax.random.PRNGKey(1), num_figures=0)
    noisy_sdr = float(np.mean(
        [si_sdr(p["clean"], p["perturbed"]) for p in pairs]
    ))
    enhanced_sdr = ev["metrics"]["si_sdr"]
    print(json.dumps({
        "quality_gate": tag,
        "steps": steps,
        "si_sdr_noisy_db": round(noisy_sdr, 2),
        "si_sdr_enhanced_db": round(enhanced_sdr, 2),
        "gain_db": round(enhanced_sdr - noisy_sdr, 2),
    }))
    return enhanced_sdr > noisy_sdr + margin_db


def quality_gate(epochs: int = 10, steps_per_epoch: int = 50,
                 family: str = "both") -> bool:
    """Learn -> enhance -> SI-SDR(enhanced) > SI-SDR(noisy) on the chip.

    The on-device counterpart of tests/test_learning.py (VERDICT r3 item 1):
    overfit both families on fixed (clean, noisy) pairs through the real
    engines, then enhance HELD-OUT noisy items and report the SI-SDR gain.
    Results are recorded in BASELINE.md. Reference analog:
    sgmse/util/inference.py:23-101 run per val epoch.
    """
    import jax

    ok = True
    if family in ("sgmse", "both"):
        from use_tpu.engine.loop import fit_sgmse
        from use_tpu.models.sgmse.score_model import ScoreModel

        hop, n_fft, frames = 32, 126, 32
        length = (frames - 1) * hop
        model = ScoreModel(
            backbone="ncsnpp", sde="ouve", condition="noisy",
            sde_input="noisy", n_fft=n_fft, hop_length=hop,
            num_frames=frames,
            backbone_kwargs=dict(nf=24, ch_mult=(1, 1), num_res_blocks=1),
        )
        res = fit_sgmse(
            model, _gate_dm(length, steps_per_epoch, 5.0), lr=2e-3,
            accumulate_grad_batches=1, max_epochs=epochs, seed=0, mesh=None,
            scheduler={"step_size": 1000, "gamma": 1.0},
        )
        pairs = [
            {"clean": c, "perturbed": p}
            for c, p in (_gate_pair(length, 100 + s, 5.0) for s in range(2))
        ]

        def enhance_fn(noisy, sub):
            out = model.sample(
                res.state.params, {"perturbed": noisy[None]}, sub, N=30
            )
            return np.asarray(out["enhanced"])[0]

        ok &= _gate_report(
            "sgmse_overfit", epochs * steps_per_epoch, enhance_fn, pairs, 2.0
        )

    if family in ("lsgan", "both"):
        import flax.linen as fnn

        from use_tpu.engine.loop import fit_lsgan
        from use_tpu.models.gan import losses
        from use_tpu.models.gan.discriminators import MultiPeriodDiscriminator
        from use_tpu.models.gan.generator import NCSNPPWrapper
        from use_tpu.models.gan.lsgan import LSGAN

        class TinyMPD(fnn.Module):
            @fnn.compact
            def __call__(self, x):
                logits, fmaps = MultiPeriodDiscriminator(
                    periods=(2, 3), name="MPD")(x)
                return [logits], [fmaps]

        length = (32 - 1) * 32
        gen = NCSNPPWrapper(
            n_fft=126, hop_length=32, num_frames=32,
            backbone_kwargs=dict(nf=16, ch_mult=(1, 1), num_res_blocks=1),
        )
        gan = LSGAN(
            generator=gen, discriminator=TinyMPD(),
            g_loss_cfg=losses.HifiganGLossConfig(
                sampling_rate=SR, alpha_wav_l1=1.0),
        )
        res = fit_lsgan(
            gan, _gate_dm(length, steps_per_epoch, 0.0), g_lr=2e-3,
            d_lr=5e-4, accumulate_grad_batches=1,
            max_epochs=max(epochs // 2, 5), seed=0, mesh=None,
            scheduler={"step_size": 1000, "gamma": 1.0},
        )
        pairs = [
            {"clean": c, "perturbed": p}
            for c, p in (_gate_pair(length, 100 + s, 0.0) for s in range(2))
        ]

        def g_enhance_fn(noisy, sub):
            out = gan.enhance(res.state.g.params, {"perturbed": noisy[None]})
            return np.asarray(out["fake"])[0]

        ok &= _gate_report(
            "lsgan_overfit", max(epochs // 2, 5) * steps_per_epoch,
            g_enhance_fn, pairs, 1.0,
        )
    return ok


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--family", choices=("sgmse", "lsgan", "both"), default="both")
    ap.add_argument("--quality-gate", action="store_true",
                    help="run the learn->enhance SI-SDR gate instead of the "
                         "loss-only soak")
    args = ap.parse_args()

    import jax

    print("devices:", jax.devices())
    if args.quality_gate:
        # the gate needs enough optimization to learn; the plain soak's
        # 8-epoch default is a loss-decrease smoke, so floor at 10
        ok = quality_gate(epochs=max(args.epochs, 10), family=args.family)
        print("QUALITY GATE", "PASS" if ok else "FAIL")
        sys.exit(0 if ok else 1)
    with tempfile.TemporaryDirectory() as root:
        jsons = make_corpus(root)
        dm = build_dm(jsons)
        ok = True
        if args.family in ("sgmse", "both"):
            losses = soak_sgmse(dm, args.epochs)
            print("SGMSE loss/epoch:", [round(x, 4) for x in losses])
            dec = losses[-1] < losses[0]
            print("SGMSE decreased:", dec)
            ok &= dec and np.isfinite(losses).all()
        if args.family in ("lsgan", "both"):
            losses = soak_lsgan(dm, args.epochs)
            print("LSGAN loss_G/epoch:", [round(x, 4) for x in losses])
            ok &= bool(np.isfinite(losses).all())
    print("SOAK", "PASS" if ok else "FAIL")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
