"""Offline data-preparation scripts (scripts/data_preparation/): speech-list
generation with style holdout, list->JSONL conversion, RIR bank generation.
Reference parity: scripts/data_preparation/* (generate_ears_speech_list.py,
list2json.py, rir_gen/).
"""
import glob
import json
import os
import pickle
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = os.path.join(REPO, "scripts", "data_preparation")
SR = 24000


def _write_corpus(root):
    from use_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    names = [
        "p001_whisper_1.wav", "p001_regular_1.wav",
        "p002_regular_1.wav", "p002_loud_2.wav",
    ]
    for n in names:
        write_wav(
            os.path.join(root, n),
            rng.standard_normal(SR // 4).astype(np.float32) * 0.2, SR,
        )
    return names


def _run(script, *args):
    return subprocess.run(
        [sys.executable, os.path.join(SCRIPTS, script), *args],
        capture_output=True, text=True, timeout=300,
    )


def test_generate_speech_list_and_list2json(tmp_path):
    corpus = tmp_path / "ears"
    corpus.mkdir()
    _write_corpus(str(corpus))

    train = str(tmp_path / "train.list")
    valid = str(tmp_path / "valid.list")
    r = _run(
        "generate_speech_list.py", "--root", str(corpus),
        "--out-train", train, "--out-valid", valid,
        "--holdout-substrings", "whisper", "--valid-fraction", "0.34",
    )
    assert r.returncode == 0, r.stderr
    files = open(train).read().splitlines() + open(valid).read().splitlines()
    assert len(files) == 3  # whisper held out
    assert all("whisper" not in f for f in files)

    out = str(tmp_path / "speech.jsonl")
    r = _run("list2json.py", "--list", train, "--out", out)
    assert r.returncode == 0, r.stderr
    rows = [json.loads(l) for l in open(out)]
    assert len(rows) == len(open(train).read().splitlines())
    for row in rows:
        assert row["sample_rate"] == SR
        assert row["duration"] == pytest.approx(0.25, rel=1e-3)


@pytest.mark.parametrize("backend", ["ism", "fra"])
def test_generate_rirs(tmp_path, backend):
    out_dir = str(tmp_path / f"rirs_{backend}")
    lst = str(tmp_path / f"rirs_{backend}.list")
    r = _run(
        "generate_rirs.py", "--out", out_dir, "--num", "2",
        "--sr", "24000", "--backend", backend, "--list-out", lst,
        "--seed", "0", "--max-order", "4",
    )
    assert r.returncode == 0, r.stderr
    made = sorted(glob.glob(os.path.join(out_dir, "**", "*"), recursive=True))
    made = [m for m in made if os.path.isfile(m)]
    assert len(made) >= 2, made
    # rt60 embedded in the filename (dataset get_rir parses rt{value}_)
    assert any("rt" in os.path.basename(m) for m in made)
    with open(made[0], "rb") as f:
        payload = pickle.load(f)
    rir = np.asarray(payload["rir"])
    assert rir.ndim == 2 and rir.shape[1] == 1 and np.isfinite(rir).all()
    assert open(lst).read().splitlines()


def test_predenoise_fallback(tmp_path):
    """Predenoising workflow (corpus in -> mirrored denoised corpus out)
    with the spectral-gate fallback backend."""
    from use_tpu.data.audio_io import read_wav, write_wav

    src = tmp_path / "noisy" / "spk"
    src.mkdir(parents=True)
    rng = np.random.default_rng(1)
    t = np.arange(SR) / SR
    wav = (0.3 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(SR))
    write_wav(str(src / "a.wav"), wav.astype(np.float32), SR)

    out = str(tmp_path / "clean")
    r = _run("predenoise.py", "--in", str(tmp_path / "noisy"), "--out", out)
    assert r.returncode == 0, r.stderr
    dst = os.path.join(out, "spk", "a.wav")
    assert os.path.exists(dst)
    den, sr = read_wav(dst)
    assert sr == SR and np.isfinite(den).all() and len(den) == SR
