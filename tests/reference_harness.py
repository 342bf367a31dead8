"""Import helper for the read-only reference (golden tests only).

Stubs the reference's unavailable heavy deps (torchaudio, pydub, ...) so its
pure-torch model code can run on CPU to produce numerical goldens. Nothing
from the reference is ever imported by the use_tpu package itself.
"""
import sys
import types

REFERENCE_ROOT = "/root/reference"


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
    sys.modules["pytorch_wavelets"].DWT1DForward = object

    def _unavailable(*_a, **_k):  # referenced lazily by stubbed modules
        raise RuntimeError("librosa is not available in this image")

    sys.modules["librosa"].filters = sys.modules["librosa.filters"]
    sys.modules["librosa"].util = sys.modules["librosa.util"]
    sys.modules["librosa.filters"].mel = _unavailable
    sys.modules["librosa.util"].valid_audio = _unavailable
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
