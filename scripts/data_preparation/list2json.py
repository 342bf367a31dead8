"""Convert a wav file list to the JSONL format the datamodule consumes.

Reference parity: scripts/data_preparation/list2json.py — one JSON object
per line with file_path, duration (s) and sample_rate, read from the wav
headers.

Usage:
    python scripts/data_preparation/list2json.py --list files.list --out files.jsonl
"""
from __future__ import annotations

import argparse
import json
import sys
import wave


def wav_info(path: str):
    try:
        with wave.open(path, "rb") as w:
            return w.getnframes() / w.getframerate(), w.getframerate()
    except wave.Error:
        # stdlib wave rejects IEEE-float WAVs (format 3) — the format this
        # repo's own pipeline writes; fall back to the shared reader
        import os
        import sys as _sys

        _sys.path.insert(
            0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
        )
        from use_tpu.data.audio_io import read_wav

        data, sr = read_wav(path)
        return len(data) / sr, sr


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--list", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    n_ok = n_bad = 0
    with open(args.list) as fin, open(args.out, "w") as fout:
        for line in fin:
            path = line.strip()
            if not path:
                continue
            try:
                duration, sr = wav_info(path)
            except Exception as e:
                print(f"skip {path}: {e}", file=sys.stderr)
                n_bad += 1
                continue
            fout.write(
                json.dumps(
                    {"file_path": path, "duration": round(duration, 3), "sample_rate": sr}
                )
                + "\n"
            )
            n_ok += 1
    print(f"{n_ok} entries written, {n_bad} skipped")


if __name__ == "__main__":
    main()
