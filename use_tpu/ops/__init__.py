from use_tpu.ops.stft import (
    STFTConfig,
    from_complex,
    get_window,
    istft,
    pad_spec,
    spec_back,
    spec_fwd,
    stft,
    to_complex,
)

__all__ = [
    "STFTConfig",
    "stft",
    "istft",
    "spec_fwd",
    "spec_back",
    "pad_spec",
    "get_window",
    "to_complex",
    "from_complex",
]
