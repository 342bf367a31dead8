"""Import helper for the read-only reference (golden tests only).

Stubs the reference's unavailable heavy deps (torchaudio, pydub, ...) so its
pure-torch model code can run on CPU to produce numerical goldens. Nothing
from the reference is ever imported by the use_tpu package itself.
"""
import sys
import types

REFERENCE_ROOT = "/root/reference"


def _make_dwt1d_forward():
    """Functional DWT1DForward(wave='db3', J=1, mode='zero') replacement.

    pytorch_wavelets itself is not in this image; this reimplements its
    single-level zero-mode analysis bank as one strided conv1d with the
    standard pywt db3 decomposition filters (time-reversed for conv1d's
    correlation), the SAME arithmetic use_tpu/models/gan/msd.py::dwt1d_db3
    uses on the JAX side. Golden tests through this stub therefore validate
    the discriminator stacks, weight-norm folding and scale plumbing — the
    DWT itself is validated against its analytic properties in
    tests/test_gan.py, not against pytorch_wavelets.
    """
    import numpy as np
    import torch

    dec_lo = np.array(
        [0.03522629188210, -0.08544127388224, -0.13501102001039,
         0.45987750211933, 0.80689150931334, 0.33267055295096], np.float64
    )
    dec_hi = np.array(
        [-0.33267055295096, 0.80689150931334, -0.45987750211933,
         -0.13501102001039, 0.08544127388224, 0.03522629188210], np.float64
    )
    w = np.stack([dec_lo[::-1], dec_hi[::-1]])[:, None, :]  # [2, 1, 6]
    weight = torch.from_numpy(w.astype(np.float32))

    class DWT1DForward(torch.nn.Module):
        def __init__(self, wave="db3", J=1, mode="zero"):
            super().__init__()
            assert (wave, J, mode) == ("db3", 1, "zero"), (wave, J, mode)

        def forward(self, x):  # x [B, 1, T]
            y = torch.nn.functional.conv1d(
                x, weight.to(x.dtype), stride=2, padding=len(dec_lo) - 2
            )
            return y[:, :1], [y[:, 1:]]

    return DWT1DForward


def import_reference():
    for name in [
        "torchaudio", "torchaudio.transforms", "torchaudio.functional",
        "pydub", "pytorch_wavelets", "librosa", "librosa.filters",
        "librosa.util",
    ]:
        if name not in sys.modules:
            mod = types.ModuleType(name)
            sys.modules[name] = mod
    sys.modules["pydub"].AudioSegment = object
    sys.modules["pytorch_wavelets"].DWT1DForward = _make_dwt1d_forward()

    def _unavailable(*_a, **_k):  # referenced lazily by stubbed modules
        raise RuntimeError("librosa is not available in this image")

    sys.modules["librosa"].filters = sys.modules["librosa.filters"]
    sys.modules["librosa"].util = sys.modules["librosa.util"]
    sys.modules["librosa.filters"].mel = _unavailable
    sys.modules["librosa.util"].valid_audio = _unavailable
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
