"""Generate banks of room impulse responses (image-source method, numpy).

Reference parity: scripts/data_preparation/rir_gen/*.py — near/far-field
monaural RIR banks at 24k/48k generated with rir_generator/pyroomacoustics
over a worker pool. Neither library is available here, so this implements
the classic Allen-Berkley image-source method directly (shoebox room,
frequency-independent wall absorption, fractional-delay sinc taps), plus
the FRA-RIR fast approximation as an alternative backend.

Each output file is a pickle {'rir': [n, 1], 'rt60': float} named with the
rt60 embedded (rt{value}_) so the dataset's rt60 filter
(comm_distort_simu_dataset.py get_rir) can parse it.

Usage:
    python scripts/data_preparation/generate_rirs.py --out rirs/ --num 100 \
        --sr 24000 --backend ism --list-out rirs.list
"""
from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def ism_rir(sr: int, rng: np.random.Generator, max_order: int = 20):
    """Shoebox image-source RIR with a random room/source/mic geometry."""
    room = rng.uniform([3.0, 3.0, 2.4], [10.0, 8.0, 4.0])
    absorption = rng.uniform(0.2, 0.7)
    beta = np.sqrt(1.0 - absorption)
    mic = rng.uniform(0.5, room - 0.5)
    src = rng.uniform(0.5, room - 0.5)
    c = 343.0

    # Sabine RT60 estimate for naming/filtering
    volume = np.prod(room)
    surface = 2 * (room[0] * room[1] + room[0] * room[2] + room[1] * room[2])
    rt60 = float(0.161 * volume / (surface * absorption))

    length = int(sr * min(max(rt60 * 1.2, 0.1), 1.5))
    rir = np.zeros(length + 64)
    orders = range(-max_order // 2, max_order // 2 + 1)
    # image positions along each axis: x_img = +-src + 2*n*L
    for nx in orders:
        for ny in orders:
            for nz in range(-2, 3):
                for sx in (1, -1):
                    for sy in (1, -1):
                        for sz in (1, -1):
                            img = np.array([
                                sx * src[0] + 2 * nx * room[0],
                                sy * src[1] + 2 * ny * room[1],
                                sz * src[2] + 2 * nz * room[2],
                            ])
                            dist = np.linalg.norm(img - mic)
                            delay = dist / c * sr
                            if delay >= length:
                                continue
                            refl = (
                                abs(nx) * 2 + (sx < 0) + abs(ny) * 2 + (sy < 0)
                                + abs(nz) * 2 + (sz < 0)
                            )
                            amp = beta ** refl / max(dist, 0.1)
                            # 8-tap windowed-sinc fractional delay
                            i0 = int(delay)
                            frac = delay - i0
                            t = np.arange(-3, 5) - frac
                            taps = np.sinc(t) * np.hanning(8)
                            lo = max(0, i0 - 3)
                            hi = min(len(rir), i0 + 5)
                            rir[lo:hi] += amp * taps[lo - (i0 - 3) : hi - (i0 - 3)]
    rir = rir[: length]
    peak = np.abs(rir).max()
    if peak > 0:
        rir = rir / peak
    return rir.astype(np.float32), rt60


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--num", type=int, default=100)
    ap.add_argument("--sr", type=int, default=24000)
    ap.add_argument("--backend", choices=["ism", "fra"], default="ism")
    ap.add_argument("--list-out", default=None)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--max-order", type=int, default=10)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    paths = []
    for i in range(args.num):
        if args.backend == "ism":
            rir, rt60 = ism_rir(args.sr, rng, args.max_order)
        else:
            from use_tpu.data.fra_rir import fra_rir

            rir_arr, _ = fra_rir(nsource=1, sr=args.sr)
            rir, rt60 = rir_arr[0], 0.0
        name = f"rir_rt{rt60:.3f}_{i:05d}.pkl"
        path = os.path.join(args.out, name)
        with open(path, "wb") as f:
            pickle.dump({"rir": rir[:, None], "rt60": rt60}, f)
        paths.append(os.path.abspath(path))
    if args.list_out:
        with open(args.list_out, "w") as f:
            f.write("\n".join(paths) + "\n")
    print(f"wrote {len(paths)} RIRs to {args.out}")


if __name__ == "__main__":
    main()
