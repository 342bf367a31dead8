"""CLI end-to-end: predict (folder->folder) and train smoke with the debug
experiment over a synthetic corpus."""
import json
import os

import numpy as np
import pytest

from use_tpu.cli.main import main
from use_tpu.data.audio_io import read_wav, write_wav

SR = 24000


@pytest.fixture
def wav_folder(tmp_path):
    src = tmp_path / "in" / "sub"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        write_wav(str(src / f"u{i}.wav"), rng.standard_normal(4000).astype(np.float32) * 0.2, SR)
    return str(tmp_path / "in"), str(tmp_path / "out")


def test_cli_predict_sgmse_debug(wav_folder):
    data, target = wav_folder
    main([
        "predict", "experiment=SGMSE_debug", "infer.N=2",
        f"predict.data_folder={data}", f"predict.target_folder={target}",
    ])
    out = os.path.join(target, "sub", "u0.wav")
    assert os.path.exists(out)
    wav, sr = read_wav(out)
    assert sr == SR and len(wav) == 4000 and np.isfinite(wav).all()


def test_cli_train_smoke(tmp_path, wav_folder):
    data, _ = wav_folder
    # jsonl lists from the folder
    files = [
        os.path.join(root, n)
        for root, _d, names in os.walk(data) for n in names
    ]
    jl = str(tmp_path / "corpus.jsonl")
    with open(jl, "w") as f:
        for p in files:
            f.write(json.dumps({"file_path": p, "duration": 0.5, "sample_rate": SR}) + "\n")
    out_dir = str(tmp_path / "run")
    main([
        "train", "experiment=SGMSE_debug",
        f"data.clean_json_path={jl}", f"data.noise_json_path={jl}",
        "data.reverb_use_FRA=true", "data.min_duration_seconds=0.1",
        "data.speech_splice_seconds=1", "data.num_workers=0",
        "train.max_epochs=1", f"out_dir={out_dir}",
    ])
    assert os.path.exists(os.path.join(out_dir, "metrics.csv"))
    assert os.path.isdir(os.path.join(out_dir, "checkpoints"))