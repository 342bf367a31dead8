"""Regression pins for the approximate (simulacrum) perturbations.

The round-3 characterization (PARITY.md 'Approximate perturbations —
measured characterization'; scripts/characterize_perturb.py) measured each
codec/WebRTC simulacrum's artifact signature on a fixed speech-like probe.
This test re-measures the same four signature metrics and FAILS if a future
edit drifts a simulacrum outside the documented band — the characterization
runs in CI instead of living only as a script (VERDICT r3 item 9).

Bands are generous (+/- the measurement's draw-to-draw spread plus margin):
they pin the artifact CLASS and SEVERITY — band limit, quantization-noise
level, spectral damage, algorithmic delay — not exact sample values.
Reference counterpart being simulated:
/root/reference/src/data/components/perturb.py:1164-1590, webrtc_utils.py.
"""
import importlib.util
import os

import numpy as np
import pytest

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "characterize_perturb",
    os.path.join(_ROOT, "scripts", "characterize_perturb.py"),
)
cp = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cp)

from use_tpu.data import perturb as P  # noqa: E402

SR = cp.SR

# documented medians (PARITY.md round-3 table) with drift bands
BANDS = {
    "OPUS": (P.OPUSCodecsPerturb, {
        "bandwidth_99_hz": (7000, 8600),   # doc 7746: fixed ~8 kHz band
        "seg_snr_db": (11, 19),            # doc 14.7: quantization noise
        "lsd_db": (0.8, 1.9),              # doc 1.28
        "delay_ms": (5.0, 8.5),            # doc 6.6: Opus ~6.5 ms
    }),
    "GSM": (P.GSMcodecsPerturb, {
        "bandwidth_99_hz": (2700, 3700),   # doc 3164: ~3.2 kHz RPE-LTP band
        "seg_snr_db": (8, 15),             # doc 11.2
        "lsd_db": (1.4, 2.8),              # doc 2.04
        "delay_ms": (-1.0, 1.5),           # doc 0.1
    }),
    "MP3": (P.MP3CompressorPerturb, {
        "bandwidth_99_hz": (5200, 8800),   # doc 6926: VBR-tracked lowpass
        "seg_snr_db": (12, 21),            # doc 16.6
        "lsd_db": (0.6, 1.4),              # doc 0.93
        "delay_ms": (20, 28),              # doc 24.1: lame encoder delay
    }),
    "AAC": (P.AACConversionPerturb, {
        "bandwidth_99_hz": (8800, 10900),  # doc 9844: ~0.85 Nyquist
        "seg_snr_db": (12, 21),            # doc 16.8
        "lsd_db": (0.3, 0.8),              # doc 0.51
        "delay_ms": (-1.0, 1.0),           # doc 0.0: delay compensated
    }),
    "WebRTC AGC": (P.WebRTCAGCPerturb, {
        "bandwidth_99_hz": (9500, 12200),  # doc 10828
        "seg_snr_db": (3, 9),              # doc 5.3: intended gain riding
        "lsd_db": (0.4, 1.1),              # doc 0.69
        "delay_ms": (-1.0, 1.0),           # doc 0
    }),
}


@pytest.fixture(scope="module")
def probe():
    return cp.speech_probe()


@pytest.mark.parametrize("name", sorted(BANDS))
def test_simulacrum_signature_in_band(name, probe):
    cls, bands = BANDS[name]
    row = cp.characterize(name, cls(SR), probe)
    for metric, (lo, hi) in bands.items():
        assert lo <= row[metric] <= hi, (
            f"{name} {metric}={row[metric]} drifted outside the documented "
            f"band [{lo}, {hi}] (PARITY.md characterization table) — "
            "re-characterize with scripts/characterize_perturb.py and "
            "update PARITY.md + these pins if the change is intended"
        )


def test_webrtc_ns_clean_passthrough_and_noise_attenuation(probe):
    """NS pins: passthrough on clean speech to float round-trip noise
    (the real suppressor's ~0 dB clean-speech change) and 4-9 dB
    noise-floor attenuation on a noisy probe (doc 6.1 dB; real: 6-15 dB)."""
    np.random.seed(100)
    ns = P.WebRTCNSPerturb(SR)
    clean_out = np.asarray(ns(probe.copy()))
    np.testing.assert_allclose(clean_out, probe, atol=1e-6)

    rng = np.random.default_rng(1)
    noisy = probe + 0.02 * rng.standard_normal(len(probe)).astype(np.float32)
    sil = np.abs(probe) < 1e-4
    out = np.asarray(ns(noisy.copy()), np.float64)
    before = 10 * np.log10(np.mean(noisy[sil] ** 2) + 1e-12)
    after = 10 * np.log10(np.mean(out[sil] ** 2) + 1e-12)
    atten = before - after
    assert 4.0 <= atten <= 9.0, f"NS noise-floor attenuation {atten:.2f} dB"
