"""Speech quality / separation metrics.

Reference parity: src/models/components/sgmse/util/other.py:23-135 (si_sdr,
energy_ratios, LSD, mean/std helpers) and util/inference.py:49-51 (PESQ,
ESTOI hooks — those external scorers are optional; gated imports with a
clear error). All numpy, host-side.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from use_tpu.data.dsp import np_stft


def si_sdr(s: np.ndarray, s_hat: np.ndarray) -> float:
    """Scale-invariant SDR (other.py:105-108)."""
    min_len = min(len(s), len(s_hat))
    s, s_hat = s[:min_len], s_hat[:min_len]
    alpha = np.dot(s_hat, s) / (np.linalg.norm(s) ** 2 + 1e-12)
    return float(
        10 * np.log10(
            (np.linalg.norm(alpha * s) ** 2 + 1e-12)
            / (np.linalg.norm(alpha * s - s_hat) ** 2 + 1e-12)
        )
    )


def si_sdr_components(s_hat, s, n, eps=1e-10):
    """(other.py:33-45)."""
    alpha_s = np.dot(s_hat, s) / (eps + np.linalg.norm(s) ** 2)
    s_target = alpha_s * s
    alpha_n = np.dot(s_hat, n) / (eps + np.linalg.norm(n) ** 2)
    e_noise = alpha_n * n
    e_art = s_hat - s_target - e_noise
    return s_target, e_noise, e_art


def energy_ratios(s_hat, s, n, eps=1e-10) -> Tuple[float, float, float]:
    """(si_sdr, si_sir, si_sar) (other.py:48-62)."""
    s_target, e_noise, e_art = si_sdr_components(s_hat, s, n)
    sdr = 10 * np.log10(
        eps + np.linalg.norm(s_target) ** 2 / (eps + np.linalg.norm(e_noise + e_art) ** 2)
    )
    sir = 10 * np.log10(
        eps + np.linalg.norm(s_target) ** 2 / (eps + np.linalg.norm(e_noise) ** 2)
    )
    sar = 10 * np.log10(
        eps + np.linalg.norm(s_target) ** 2 / (eps + np.linalg.norm(e_art) ** 2)
    )
    return float(sdr), float(sir), float(sar)


def lsd(s_hat: np.ndarray, s: np.ndarray, eps: float = 1e-10) -> float:
    """Log-spectral distance (other.py:23-30; n_fft=510 hop=128)."""
    spec_hat = np_stft(s_hat, 510, 128)
    spec = np_stft(s, 510, 128)
    lp_hat = 2 * np.log(eps + np.abs(spec_hat))
    lp = 2 * np.log(eps + np.abs(spec))
    return float(np.mean(np.sqrt(np.mean(np.abs(lp_hat - lp)))))


def wer(r, h) -> float:
    """Word error rate by dynamic-programming edit distance (other.py's
    wer(); int32 table rather than the reference's overflow-prone uint8)."""
    d = np.zeros((len(r) + 1, len(h) + 1), dtype=np.int32)
    d[:, 0] = np.arange(len(r) + 1)
    d[0, :] = np.arange(len(h) + 1)
    for i in range(1, len(r) + 1):
        for j in range(1, len(h) + 1):
            if r[i - 1] == h[j - 1]:
                d[i, j] = d[i - 1, j - 1]
            else:
                d[i, j] = 1 + min(d[i - 1, j - 1], d[i, j - 1], d[i - 1, j])
    return float(d[len(r), len(h)]) / max(len(r), 1)


def snr_db(s: np.ndarray, n: np.ndarray) -> float:
    """(other.py:118-122)."""
    return float(10 * np.log10(np.mean(s ** 2) / (np.mean(n ** 2) + 1e-12)))


def mean_std(data: np.ndarray) -> Tuple[float, float]:
    data = np.asarray(data)
    data = data[~np.isnan(data)]
    return float(np.mean(data)), float(np.std(data))


def pesq_wb(ref: np.ndarray, deg: np.ndarray, sr: int = 16000) -> float:
    """Wide-band PESQ via the optional `pesq` package (inference.py:49)."""
    try:
        from pesq import pesq as _pesq
    except ImportError as e:  # pragma: no cover
        raise ImportError("PESQ requires the 'pesq' package (not installed)") from e
    return float(_pesq(sr, ref, deg, "wb"))


def estoi(ref: np.ndarray, deg: np.ndarray, sr: int = 10000) -> float:
    """Extended STOI (inference.py:51). Computed by the NATIVE numpy
    implementation (utils/intelligibility.py, Jensen & Taal 2016); when the
    optional `pystoi` package is present it is preferred as the published
    scorer (and the native path is golden-checked against it in tests)."""
    try:
        from pystoi import stoi as _stoi

        return float(_stoi(ref, deg, sr, extended=True))
    except ImportError:
        from use_tpu.utils.intelligibility import estoi_np

        return estoi_np(ref, deg, sr)


def evaluate_pair(
    clean: np.ndarray, enhanced: np.ndarray, noisy: np.ndarray,
    sr: int = 24000,
) -> Dict[str, float]:
    """Metric dict for one utterance (util/inference.py:23-101 analog).

    ESTOI is always computed (native implementation). PESQ (ITU P.862)
    remains gated on the external `pesq` package — the codec is not
    reimplementable here and the package is absent in this environment, so
    the key is simply missing from the dict when unavailable."""
    from use_tpu.data.dsp import resample_poly

    out = {
        "si_sdr": si_sdr(clean, enhanced),
        "lsd": lsd(enhanced, clean),
    }
    n = noisy[: len(clean)] - clean[: len(noisy)]
    sdr, sir, sar = energy_ratios(enhanced[: len(clean)], clean[: len(enhanced)], n)
    out.update({"si_sir": sir, "si_sar": sar})
    try:
        out["estoi"] = estoi(
            resample_poly(clean, sr, 10000),
            resample_poly(enhanced, sr, 10000),
            10000,
        )
    except ValueError:
        pass  # clip too short/silent for the 384 ms segment analysis
    try:
        out["pesq_wb"] = pesq_wb(
            resample_poly(clean, sr, 16000),
            resample_poly(enhanced, sr, 16000),
            16000,
        )
    except ImportError:
        pass
    return out
