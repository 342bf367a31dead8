"""Data-layer tests: perturbations, FRA-RIR, dataset pipeline, loader."""
import json
import os

import numpy as np
import pytest

from use_tpu.data import perturb as P
from use_tpu.data.audio_io import read_wav, write_wav
from use_tpu.data.collate import pad_to_longest_monaural
from use_tpu.data.distort_dataset import DistortConfig, DistortDataset, vad_merge
from use_tpu.data.dsp import np_istft, np_stft
from use_tpu.data.fra_rir import fra_rir
from use_tpu.data.loader import DataLoader

SR = 24000


def _tone(seconds=1.0, freq=440.0, sr=SR):
    t = np.arange(int(seconds * sr)) / sr
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_np_stft_roundtrip():
    x = _tone(0.5)[: 23 * 512]  # hop-divisible length reconstructs exactly
    spec = np_stft(x, 2048, 512)
    back = np_istft(spec, 512, length=len(x))
    np.testing.assert_allclose(back, x, atol=1e-6)


@pytest.mark.parametrize(
    "cls,kwargs",
    [
        (P.LoudnessPerturb, {}),
        (P.SpeakerDistortionPerturbHardClip, {}),
        (P.SpeakerDistortionPerturbHardClipOnRate, {}),
        (P.SpeakerDistortionPerturbSoftClip, {}),
        (P.SpeakerDistortionPerturbSigmoid1, {}),
        (P.SpeakerDistortionPerturbSigmoid2, {}),
        (P.SpeakerDistortionPerturbSox, {}),
        (P.SpeakerDistortionPerturbPedal, {}),
        (P.SpeakerDistortionPerturbClipPedal, {}),
        (P.EQPerturb, {"sample_rate": SR}),
        (P.EQPerturbFreq, {}),
        (P.EQPerturbTime, {}),
        (P.EQMuchGainPerturb, {"sample_rate": SR, "freq_min": 1500, "freq_max": 11000}),
        (P.BassBoostPerturb, {}),
        (P.DRCPerturb, {}),
        (P.LowPassPerturb, {"min_cutoff_freq": 800, "max_cutoff_freq": 11000}),
        (P.BandRejectPerturb, {"use_stft": True}),
        (P.BandRejectPerturb, {"use_stft": False, "min_center_freq": 100, "max_center_freq": 8000}),
        (P.SpectralLeakagePerturb, {}),
        (P.SpectralTimeFreqHolesPerturb, {}),
        (P.DCOffsetPerturb, {}),
        (P.WhiteNoisePerturb, {"snr_min": 10, "snr_max": 30}),
        (P.ColoredNoisePerturb, {"snr_min": 10, "snr_max": 30}),
        (P.MP3CompressorPerturb, {}),
        (P.GSMcodecsPerturb, {}),
        (P.OPUSCodecsPerturb, {}),
        (P.AACConversionPerturb, {}),
        (P.BitCrushPerturb, {}),
        (P.PacketLossPerturb, {}),
        (P.WebRTCNSPerturb, {}),
        (P.WebRTCAGCPerturb, {}),
    ],
)
def test_perturbation_preserves_shape_and_finiteness(cls, kwargs):
    np.random.seed(0)
    x = _tone(0.4)
    if "sample_rate" in kwargs:
        p = cls(**kwargs)
    else:
        p = cls(SR, **kwargs)
    y = np.asarray(p(x))
    assert y.shape == x.shape, cls.__name__
    assert np.isfinite(y).all(), cls.__name__
    assert float(np.abs(y).max()) < 100.0, cls.__name__


def test_hard_clip_on_rate_clips_requested_fraction():
    np.random.seed(0)
    x = np.random.randn(24000).astype(np.float32)
    p = P.SpeakerDistortionPerturbHardClipOnRate(SR, clip_rate=0.2)
    y = p(x)
    frac = np.mean(np.abs(y) >= np.abs(y).max() - 1e-7)
    assert 0.1 < frac < 0.35


def test_speed_and_pitch():
    np.random.seed(0)
    x = _tone(0.5)
    y = P.SpeedPerturb(SR, speed_rate=1.25)(x)
    assert abs(len(y) - len(x) / 1.25) < 512
    z = P.PitchPerturb(SR, semitone=2.0)(x)
    assert z.shape == x.shape


def test_fra_rir():
    np.random.seed(0)
    rir, direct = fra_rir(nsource=2, sr=16000)
    assert rir.shape == direct.shape and rir.shape[0] == 2
    assert np.isfinite(rir).all()
    # direct-path energy is a subset of total energy
    assert np.sum(direct ** 2) <= np.sum(rir ** 2) + 1e-6


@pytest.fixture
def tiny_corpus(tmp_path):
    paths = {"clean": [], "noise": []}
    rng = np.random.default_rng(0)
    for kind in paths:
        for i in range(3):
            path = str(tmp_path / f"{kind}{i}.wav")
            if kind == "clean":
                wav = _tone(1.5, 200 + 100 * i) * (0.4 + 0.1 * rng.random())
            else:
                wav = rng.standard_normal(int(1.2 * SR)).astype(np.float32) * 0.1
            write_wav(path, wav, SR)
            paths[kind].append(path)
    jsons = {}
    for kind, files in paths.items():
        jp = str(tmp_path / f"{kind}.jsonl")
        with open(jp, "w") as f:
            for p in files:
                f.write(json.dumps({"file_path": p, "duration": 1.5, "sample_rate": SR}) + "\n")
        jsons[kind] = jp
    return jsons


def test_distort_dataset_end_to_end(tiny_corpus):
    np.random.seed(0)
    cfg = DistortConfig(
        clean_json_path=tiny_corpus["clean"],
        noise_json_path=tiny_corpus["noise"],
        speech_splice_seconds=2,
        reverb_use_FRA=True,
        min_duration_seconds=1,
    )
    ds = DistortDataset(cfg)
    assert len(ds) == 3
    for i in range(3):
        item = ds[i]
        assert item["clean"].shape == item["perturbed"].shape
        assert np.isfinite(item["clean"]).all() and np.isfinite(item["perturbed"]).all()
        assert abs(len(item["clean"]) - 2 * SR) < SR  # ~ splice length
        assert np.abs(item["perturbed"]).max() <= 0.81


def test_loader_multiprocess(tiny_corpus):
    cfg = DistortConfig(
        clean_json_path=tiny_corpus["clean"],
        noise_json_path=tiny_corpus["noise"],
        speech_splice_seconds=1,
        reverb_use_FRA=True,
        # keep workers fast: disable spectral/codec stages
        codecs_prob=0, packet_loss_prob=0, spectral_time_freq_holes_prob=0,
        colored_noise_prob=0, colored_noise_post_prob=0, lowpass_prob=0,
        eq_perturb_prob=0, band_reject_prob=0, reverb_prob=0,
    )
    ds = DistortDataset(cfg)
    dl = DataLoader(ds, batch_size=2, shuffle=True, num_workers=2,
                    collate_fn=pad_to_longest_monaural, drop_last=True)
    batches = list(dl)
    assert len(batches) == 1
    b = batches[0]
    assert b["clean"].shape == b["perturbed"].shape
    assert b["clean"].shape[0] == 2


class _FlakyDataset:
    """Raises on one index — the worker-crash drill."""

    def __init__(self, n=8, bad=5):
        self.n, self.bad = n, bad

    def __len__(self):
        return self.n

    def __getitem__(self, idx):
        if idx == self.bad:
            raise ValueError(f"synthetic failure at {idx}")
        return {"clean": np.ones(10, np.float32) * idx,
                "perturbed": np.ones(10, np.float32)}


def test_loader_worker_exception_propagates_cleanly():
    """A worker exception mid-epoch surfaces as a RuntimeError naming the
    failed index — no hang, workers torn down (VERDICT r2 item 7). The
    spawned workers start clean (no fork-after-JAX deadlock risk)."""
    dl = DataLoader(
        _FlakyDataset(), batch_size=2, num_workers=2,
        collate_fn=lambda xs: xs,
    )
    with pytest.raises(RuntimeError, match="index 5"):
        list(dl)
    # the loader remains usable for the next epoch with a healthy dataset
    dl2 = DataLoader(
        _FlakyDataset(bad=10**9), batch_size=2, num_workers=2,
        collate_fn=lambda xs: xs,
    )
    assert len(list(dl2)) == 4


def test_vad_merge_trims_silence():
    x = np.concatenate([np.zeros(8000), _tone(0.5), np.zeros(8000)]).astype(np.float32)
    merged = vad_merge(x)
    assert len(merged) < len(x)
    assert np.sqrt(np.mean(merged ** 2)) > np.sqrt(np.mean(x ** 2))


def test_wav_io_roundtrip(tmp_path):
    x = _tone(0.1)
    p = str(tmp_path / "t.wav")
    write_wav(p, x, SR)
    y, sr = read_wav(p)
    assert sr == SR
    np.testing.assert_allclose(y, x, atol=1e-6)
    write_wav(p, x, SR, subtype="pcm16")
    y, _ = read_wav(p)
    np.testing.assert_allclose(y, x, atol=1e-3)


def test_datamodule_per_process_decorrelation(tiny_corpus):
    """Hosts with different process_index synthesize DIFFERENT batches from
    the same config/seed (reference seeds per rank,
    comm_distort_simu_dataset.py:235-238; VERDICT r2 'missing #2')."""
    from use_tpu.data.datamodule import DistortDataModule

    cfg = DistortConfig(
        clean_json_path=tiny_corpus["clean"],
        noise_json_path=tiny_corpus["noise"],
        speech_splice_seconds=1,
        reverb_use_FRA=True,
        codecs_prob=0, packet_loss_prob=0, spectral_time_freq_holes_prob=0,
        colored_noise_prob=0, colored_noise_post_prob=0, lowpass_prob=0,
        eq_perturb_prob=0, band_reject_prob=0, reverb_prob=0,
    )

    def first_batch(pi):
        dm = DistortDataModule(
            train_cfg=cfg, batch_size=2, num_workers=1, seed=7,
            process_index=pi,
        )
        return next(iter(dm.train_dataloader()))

    b0, b1 = first_batch(0), first_batch(1)
    assert b0["perturbed"].shape[0] == b1["perturbed"].shape[0] == 2
    n = min(b0["perturbed"].shape[1], b1["perturbed"].shape[1])
    assert not np.allclose(b0["perturbed"][:, :n], b1["perturbed"][:, :n])
