"""Pre-denoise a clean-speech corpus before training-list generation.

Reference parity: scripts/data_preparation/predenoise_*.py (silero /
modelscope DFSMN denoisers). Those external models are not available here;
this script uses this framework's own enhancers instead — an LSGAN generator
checkpoint, or a spectral-subtraction fallback — preserving the workflow:
corpus in, denoised corpus out with mirrored structure.

Usage:
    python scripts/data_preparation/predenoise.py --in noisy/ --out clean/ \
        [--experiment LSGAN --ckpt path]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

from use_tpu.data.audio_io import read_wav, write_wav  # noqa: E402
from use_tpu.data.perturb import WebRTCNSPerturb  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="inp", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--experiment", default=None)
    ap.add_argument("--ckpt", default=None)
    args = ap.parse_args()

    enhance = None
    if args.experiment and args.ckpt:
        import jax
        from use_tpu.cli.main import _build_model, _load_state_params
        from use_tpu.config.config import load_config

        cfg = load_config(args.experiment)
        model = _build_model(cfg)
        params = _load_state_params(model, cfg, args.ckpt)

        def enhance(wav, sr):
            import jax.numpy as jnp

            out = model.enhance(params, {"perturbed": jnp.asarray(wav)[None]})
            return np.asarray(out["fake"])[0]
    else:
        ns = None

        def enhance(wav, sr):
            nonlocal ns
            if ns is None or ns._sr != sr:
                ns = WebRTCNSPerturb(sr, levels=(2,))
            return ns(wav)

    n = 0
    for root, _dirs, names in os.walk(args.inp):
        for name in sorted(names):
            if not name.lower().endswith(".wav"):
                continue
            src = os.path.join(root, name)
            dst = src.replace(args.inp, args.out, 1)
            wav, sr = read_wav(src)
            if wav.ndim > 1:
                wav = wav[:, 0]
            write_wav(dst, enhance(wav, sr), sr)
            n += 1
    print(f"denoised {n} files -> {args.out}")


if __name__ == "__main__":
    main()
