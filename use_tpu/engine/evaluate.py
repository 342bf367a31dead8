"""Rich evaluation harness: enhance a validation set and score it.

Reference parity: src/models/components/sgmse/util/inference.py:23-101
(evaluate_model) — loop files, model.enhance, compute PESQ/SI-SDR/ESTOI (+
LSD / SI-SIR / SI-SAR), collect spectrogram figures and audio for logging.
Optional scorers (pesq, pystoi) are skipped when not installed.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import numpy as np

from use_tpu.utils.metrics import evaluate_pair
from use_tpu.utils.logging import ranked_logger

log = ranked_logger()


def evaluate_model(
    enhance_fn: Callable[[np.ndarray, jax.Array], np.ndarray],
    pairs: List[Dict[str, np.ndarray]],
    rng: jax.Array,
    num_figures: int = 2,
    sr: int = 24000,
) -> Dict[str, Any]:
    """enhance_fn(noisy [L], rng) -> enhanced [L]; pairs: dicts with
    'clean' and 'perturbed'. Returns mean metrics + figures + audio."""
    rows = []
    figures = []
    audio = []
    for i, pair in enumerate(pairs):
        rng, sub = jax.random.split(rng)
        clean = np.asarray(pair["clean"])
        noisy = np.asarray(pair["perturbed"])
        enhanced = np.asarray(enhance_fn(noisy, sub))
        rows.append(evaluate_pair(clean, enhanced, noisy, sr=sr))
        if i < num_figures:
            from use_tpu.utils.graphics import visualize_example

            figures.append(visualize_example(noisy, enhanced, clean, sr=sr))
            audio.append({"noisy": noisy, "enhanced": enhanced, "clean": clean})

    # union of keys: per-utterance scorers may skip (e.g. ESTOI on clips
    # shorter than its 384 ms segment window); average over rows that have
    # each key
    keys = sorted({k for r in rows for k in r})
    means = {
        k: float(np.mean([r[k] for r in rows if k in r])) for k in keys
    }
    log.info("eval: " + " ".join(f"{k}={v:.3f}" for k, v in means.items()))
    return {"metrics": means, "per_utt": rows, "figures": figures, "audio": audio}
