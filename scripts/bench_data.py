"""Distortion-pipeline throughput benchmark (host CPU side).

The reference spends most training wall-clock inside Dataset.__getitem__
(codec subprocesses etc. — SURVEY §7 'CPU data pipeline throughput'). This
measures items/s of our re-implementation with the full perturbation chain
enabled, single-process and with worker processes, and reports audio-seconds
of training data produced per wall second (must exceed the TPU step's
consumption rate for the input pipeline not to be the bottleneck).

Usage: python scripts/bench_data.py [--items 16] [--workers 0 1 2]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SR = 24000


def make_corpus(root: str, n: int = 6, seconds: float = 8.0):
    from use_tpu.data.audio_io import write_wav

    rng = np.random.default_rng(0)
    jsons = {}
    for kind in ("clean", "noise"):
        jp = os.path.join(root, f"{kind}.jsonl")
        with open(jp, "w") as f:
            for i in range(n):
                p = os.path.join(root, f"{kind}{i}.wav")
                t = np.arange(int(seconds * SR)) / SR
                if kind == "clean":
                    wav = 0.3 * np.sin(2 * np.pi * (110 + 37 * i) * t) * (
                        0.6 + 0.4 * np.sin(2 * np.pi * 3.0 * t)
                    )
                else:
                    wav = 0.2 * rng.standard_normal(len(t))
                write_wav(p, wav.astype(np.float32), SR)
                f.write(
                    json.dumps(
                        {"file_path": p, "duration": seconds, "sample_rate": SR}
                    )
                    + "\n"
                )
        jsons[kind] = jp
    return jsons


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=16)
    ap.add_argument("--workers", type=int, nargs="*", default=[0, 2])
    ap.add_argument("--splice-seconds", type=float, default=6.0)
    args = ap.parse_args()

    from use_tpu.data.collate import pad_to_longest_monaural
    from use_tpu.data.distort_dataset import DistortConfig, DistortDataset
    from use_tpu.data.loader import DataLoader

    with tempfile.TemporaryDirectory() as root:
        jsons = make_corpus(root)
        cfg = DistortConfig(
            clean_json_path=jsons["clean"],
            noise_json_path=jsons["noise"],
            speech_splice_seconds=args.splice_seconds,
            reverb_use_FRA=True,
            min_duration_seconds=1.0,
        )
        ds = DistortDataset(cfg)
        # repeat the corpus up to the requested item count
        class _Rep:
            def __init__(self, ds, n): self.ds, self.n = ds, n
            def __len__(self): return self.n
            def __getitem__(self, i): return self.ds[i % len(self.ds)]
        ds = _Rep(ds, args.items)

        # warm one item (lazy caches: RIR banks, filter designs)
        t0 = time.perf_counter()
        _ = ds[0]
        print(f"first item (cold): {time.perf_counter()-t0:.2f}s")

        for nw in args.workers:
            dl = DataLoader(
                ds, batch_size=4, num_workers=nw,
                collate_fn=pad_to_longest_monaural, seed=0,
            )
            t0 = time.perf_counter()
            n = 0
            for batch in dl:
                n += batch["clean"].shape[0]
            wall = time.perf_counter() - t0
            audio_s = n * args.splice_seconds
            print(
                f"workers={nw}: {n} items in {wall:.2f}s = {n/wall:.2f} items/s"
                f" = {audio_s/wall:.1f} audio-s/s"
            )


if __name__ == "__main__":
    main()
