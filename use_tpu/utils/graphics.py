"""Spectrogram/waveform figures for logging (matplotlib, host-side).

Reference parity: src/models/components/sgmse/util/graphics.py:24-110 —
spectrogram comparison figures (noisy/estimate/clean) for TensorBoard.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from use_tpu.data.dsp import np_stft


def spec_db(x: np.ndarray, n_fft: int = 512, hop: int = 128, eps: float = 1e-10) -> np.ndarray:
    s = np.abs(np_stft(np.asarray(x, np.float64), n_fft, hop))
    return 20 * np.log10(s + eps)


def visualize_example(
    noisy: np.ndarray,
    estimate: np.ndarray,
    clean: Optional[np.ndarray] = None,
    sr: int = 24000,
    n_fft: int = 512,
    hop: int = 128,
):
    """Figure with stacked spectrograms (returns a matplotlib Figure)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = 3 if clean is not None else 2
    fig, axes = plt.subplots(rows, 1, figsize=(8, 3 * rows), sharex=True)
    names = ["noisy", "estimate"] + (["clean"] if clean is not None else [])
    sigs = [noisy, estimate] + ([clean] if clean is not None else [])
    vmax = None
    for ax, name, sig in zip(np.atleast_1d(axes), names, sigs):
        db = spec_db(sig, n_fft, hop)
        if vmax is None:
            vmax = db.max()
        im = ax.imshow(
            db, origin="lower", aspect="auto", vmax=vmax, vmin=vmax - 80,
            extent=[0, len(sig) / sr, 0, sr / 2 / 1000], cmap="magma",
        )
        ax.set_ylabel(f"{name}\nkHz")
        fig.colorbar(im, ax=ax)
    np.atleast_1d(axes)[-1].set_xlabel("time (s)")
    fig.tight_layout()
    return fig


def visualize_one(sig: np.ndarray, sr: int = 24000, n_fft: int = 512, hop: int = 128):
    """Single spectrogram figure (graphics.py:110 analog)."""
    return visualize_example(sig, sig, None, sr, n_fft, hop)
