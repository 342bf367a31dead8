"""Generate clean-speech file lists with a style/speaker holdout.

Reference parity: scripts/data_preparation/generate_ears_speech_list.py:22-56
— walk a corpus root, optionally hold out styles/speakers by substring, and
write train/valid lists.

Usage:
    python scripts/data_preparation/generate_speech_list.py \
        --root /data/EARS --out-train train.list --out-valid valid.list \
        --holdout-substrings whisper highpitch --valid-fraction 0.01
"""
from __future__ import annotations

import argparse
import os
import random


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--out-train", required=True)
    ap.add_argument("--out-valid", required=True)
    ap.add_argument("--holdout-substrings", nargs="*", default=[])
    ap.add_argument("--valid-fraction", type=float, default=0.01)
    ap.add_argument("--extensions", nargs="*", default=[".wav", ".flac"])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    files = []
    for root, _dirs, names in os.walk(args.root):
        for n in sorted(names):
            if any(n.lower().endswith(e) for e in args.extensions):
                path = os.path.join(root, n)
                if any(h in path for h in args.holdout_substrings):
                    continue
                files.append(path)
    random.Random(args.seed).shuffle(files)
    n_valid = max(int(len(files) * args.valid_fraction), 1)
    with open(args.out_valid, "w") as f:
        f.write("\n".join(files[:n_valid]) + "\n")
    with open(args.out_train, "w") as f:
        f.write("\n".join(files[n_valid:]) + "\n")
    print(f"{len(files) - n_valid} train / {n_valid} valid files")


if __name__ == "__main__":
    main()
