"""Proof the framework trains models that ENHANCE (VERDICT r3 item 1).

Every other training assertion in the suite stops at "loss is finite /
decreasing". These tests close the loop the reference's validation culture
closes every epoch (PESQ/SI-SDR/ESTOI on real enhanced audio —
/root/reference/src/models/components/sgmse/model.py:205-219,
sgmse/util/inference.py:23-101): overfit-train a small model on a fixed toy
corpus through the REAL engine (fit_sgmse / fit_lsgan — the same code
cmd_train drives), then enhance HELD-OUT noisy items via evaluate_model and
assert SI-SDR(enhanced) beats SI-SDR(noisy) by a margin.

Probes are formant-synthesized pseudo-speech (use_tpu/data/synth_speech.py
— pitch contour + vowel formants + voiced/unvoiced structure), replacing
the round-4 harmonic combs so the gates measure enhancement on speech-like
spectra. Measured headroom when the gates were re-set for the speech
probes (CPU, f32, scripts/probe_gate_study.py): SGMSE reaches +5.65 dB
over the noisy input after 600 steps on a 12-probe pool (5 dB-SNR probe);
the LSGAN generator reaches +4.47 dB after 500 steps (0 dB-SNR probe,
nf=32 G, d_lr=1e-4, alpha_adv_feat=1 — its output SI-SDR is
reconstruction-bound at this training length, so the lower input SNR
exposes the gain; the shipping feat-10/fast-D balance collapses the tiny
probe D). The gates assert a conservative fraction of the measured
numbers so they pin "learning happened", not an exact trajectory. The TPU
counterpart runs in scripts/soak_train_tpu.py (--quality-gate) with the
result recorded in BASELINE.md.
"""
import numpy as np
import pytest

import jax
import flax.linen as fnn

from use_tpu.engine.evaluate import evaluate_model
from use_tpu.engine.loop import fit_lsgan, fit_sgmse
from use_tpu.models.gan.discriminators import MultiPeriodDiscriminator
from use_tpu.models.gan.generator import NCSNPPWrapper
from use_tpu.models.gan.lsgan import LSGAN
from use_tpu.data.synth_speech import synth_pair
from use_tpu.models.sgmse.score_model import ScoreModel
from use_tpu.utils.metrics import si_sdr

SR = 24000


def _make_pair(length, seed, snr_db=5.0):
    """Formant-synthesized pseudo-speech + white noise at snr_db.

    Speech-shaped probes (pitch contour, vowel formants, voiced/unvoiced
    segments — use_tpu/data/synth_speech.py) rather than a stationary
    harmonic comb, approximating the EARS clean-speech distribution the
    reference trains on (comm_distort_simu_dataset.py get_clean)."""
    return synth_pair(length, seed, snr_db=snr_db, sr=SR)


class _FixedPairsDM:
    """Fixed toy corpus: a pool of (clean, noisy) speech-probe pairs served
    batch-4 in deterministic rotation. The formant probes need a larger
    pool than the old harmonic combs (one random vowel+f0 per probe; 4
    examples don't span the space the held-out items draw from)."""

    def __init__(self, length, steps_per_epoch, snr_db=5.0, pool=12):
        self.local_batch = 4
        self._steps = steps_per_epoch
        pairs = [_make_pair(length, s, snr_db) for s in range(pool)]
        self._clean = np.stack([p[0] for p in pairs])
        self._noisy = np.stack([p[1] for p in pairs])
        self._P = pool

    def train_dataloader(self):
        idx = 0
        for _ in range(self._steps):
            sel = [(idx + j) % self._P for j in range(4)]
            idx = (idx + 4) % self._P
            yield {"clean": self._clean[sel], "perturbed": self._noisy[sel]}

    def val_dataloader(self):
        yield {"clean": self._clean[:4], "perturbed": self._noisy[:4]}


def _heldout_pairs(length, n=2, snr_db=5.0):
    return [
        {"clean": c, "perturbed": p}
        for c, p in (_make_pair(length, 100 + s, snr_db) for s in range(n))
    ]


@pytest.mark.slow
def test_sgmse_learns_to_enhance():
    """Overfit a small score model, reverse-SDE-enhance held-out noisy
    items, and require a >= +2 dB SI-SDR gain over the noisy input
    (measured ~+5 dB at these settings)."""
    hop, n_fft, frames = 32, 126, 32
    length = (frames - 1) * hop
    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition="noisy", sde_input="noisy",
        n_fft=n_fft, hop_length=hop, num_frames=frames,
        backbone_kwargs=dict(nf=24, ch_mult=(1, 1), num_res_blocks=1),
    )
    res = fit_sgmse(
        model, _FixedPairsDM(length, steps_per_epoch=50), lr=2e-3,
        accumulate_grad_batches=1, max_epochs=12, seed=0, mesh=None,
        scheduler={"step_size": 1000, "gamma": 1.0},
    )
    assert res.history[-1]["train/loss_Score"] < res.history[0]["train/loss_Score"]

    pairs = _heldout_pairs(length)

    def enhance_fn(noisy, sub):
        out = model.sample(res.state.params, {"perturbed": noisy[None]}, sub, N=30)
        return np.asarray(out["enhanced"])[0]

    ev = evaluate_model(enhance_fn, pairs, jax.random.PRNGKey(1), num_figures=0)
    noisy_sdr = float(np.mean(
        [si_sdr(p["clean"], p["perturbed"]) for p in pairs]
    ))
    enhanced_sdr = ev["metrics"]["si_sdr"]
    assert enhanced_sdr > noisy_sdr + 2.0, (
        f"trained SGMSE does not enhance: SI-SDR {noisy_sdr:.2f} dB (noisy) "
        f"-> {enhanced_sdr:.2f} dB (enhanced)"
    )

    # chunked single-utterance sampling (the batch-1 latency treatment,
    # sample_chunked) must preserve the learned enhancement quality on a
    # LONG held-out utterance: same trained model, full-clip vs chunk-4
    # overlap-crossfade, both judged against clean
    long_clean, long_noisy = _make_pair(4 * length, 300)
    full = model.sample(
        res.state.params, {"perturbed": long_noisy[None]},
        jax.random.PRNGKey(2), N=30,
    )["enhanced"]
    chunked = model.sample_chunked(
        res.state.params, {"perturbed": long_noisy[None]},
        jax.random.PRNGKey(2), n_chunks=4, overlap_frames=8, N=30,
    )["enhanced"]
    sdr_noisy = si_sdr(long_clean, long_noisy)
    sdr_full = si_sdr(long_clean, np.asarray(full)[0])
    sdr_chunk = si_sdr(long_clean, np.asarray(chunked)[0])
    assert sdr_chunk > sdr_noisy + 2.0, (sdr_noisy, sdr_full, sdr_chunk)
    assert sdr_chunk > sdr_full - 1.5, (
        f"chunked sampling degrades quality: full {sdr_full:.2f} dB vs "
        f"chunked {sdr_chunk:.2f} dB"
    )


class _TinyMPD(fnn.Module):
    """Small MPD-only composite with the [bank][disc] output structure."""

    @fnn.compact
    def __call__(self, x):
        logits, fmaps = MultiPeriodDiscriminator(periods=(2, 3), name="MPD")(x)
        return [logits], [fmaps]


@pytest.mark.slow
def test_lsgan_generator_learns_to_enhance():
    """Overfit the predictive (LSGAN) family through the adversarial
    two-optimizer engine and require an SI-SDR gain on held-out noisy
    items (0 dB-SNR probe; measured +1.9 dB at these settings — the G's
    output SI-SDR is reconstruction-bound at 250 steps, so a 5 dB input
    would mask the learned gain)."""
    from use_tpu.models.gan import losses

    length = (32 - 1) * 32
    gen = NCSNPPWrapper(
        n_fft=126, hop_length=32, num_frames=32,
        backbone_kwargs=dict(nf=32, ch_mult=(1, 1), num_res_blocks=1),
    )
    gan = LSGAN(
        generator=gen, discriminator=_TinyMPD(),
        # gate-probe criterion weights (per-experiment configs in the
        # reference too): unit wav-L1 keeps the time-domain gradient the
        # short overfit needs, and alpha_adv_feat=1 (vs the shipping 10)
        # stops the tiny D's feature-matching term from dominating — at
        # feat 10 / d_lr 5e-4 the D collapses to ~0 loss on the speech
        # probes and G reconstruction diverges (scripts/probe_gate_study.py)
        g_loss_cfg=losses.HifiganGLossConfig(
            sampling_rate=SR, alpha_wav_l1=1.0, alpha_adv_feat=1.0,
        ),
    )
    # g_lr 5e-4 — the CPU-stable probe rate (+7.0 dB measured). The tiny
    # adversarial probe's stable G-lr ranges do NOT overlap across
    # backends: on exact-f32 CPU 2e-3 diverges (G loss -> 77, output
    # -40 dB) while 5e-4/1e-3 gain +7.0/+5.0 dB; on the bf16-matmul chip
    # it is the reverse (2e-3 gains +4.47, 5e-4/1e-3 diverge to
    # -27.9/-7.1). The on-chip twin (scripts/soak_train_tpu.py) therefore
    # pins 2e-3. Sweeps: probe_gate_study.py; BASELINE.md round-5.
    res = fit_lsgan(
        gan, _FixedPairsDM(length, steps_per_epoch=50, snr_db=0.0),
        g_lr=5e-4, d_lr=1e-4,
        accumulate_grad_batches=1, max_epochs=10, seed=0, mesh=None,
        scheduler={"step_size": 1000, "gamma": 1.0},
    )

    pairs = _heldout_pairs(length, snr_db=0.0)

    def enhance_fn(noisy, sub):
        out = gan.enhance(res.state.g.params, {"perturbed": noisy[None]})
        return np.asarray(out["fake"])[0]

    ev = evaluate_model(enhance_fn, pairs, jax.random.PRNGKey(1), num_figures=0)
    noisy_sdr = float(np.mean(
        [si_sdr(p["clean"], p["perturbed"]) for p in pairs]
    ))
    enhanced_sdr = ev["metrics"]["si_sdr"]
    assert enhanced_sdr > noisy_sdr + 1.0, (
        f"trained LSGAN G does not enhance: SI-SDR {noisy_sdr:.2f} dB "
        f"(noisy) -> {enhanced_sdr:.2f} dB (enhanced)"
    )
