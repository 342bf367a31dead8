"""ctypes loader for the native DSP kernels (native/dsp.cpp).

Compiles the shared library on first use (g++ -O3); every entry point has a
pure-numpy fallback so the pipeline works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import warnings
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO_ROOT, "native", "dsp.cpp")
_LIB_PATH = os.path.join(_REPO_ROOT, "native", "libusedsp.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    try:
        if not os.path.exists(_LIB_PATH) or (
            os.path.exists(_SRC)
            and os.path.getmtime(_SRC) > os.path.getmtime(_LIB_PATH)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB_PATH, _SRC],
                check=True, capture_output=True, timeout=120,
            )
        lib = ctypes.CDLL(_LIB_PATH)
        lib.envelope_follow.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
            ctypes.c_int64, ctypes.c_float, ctypes.c_float,
        ]
        lib.set_holes.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.sosfilt.argtypes = [
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_int64,
        ]
        _lib = lib
    except Exception as e:  # pragma: no cover - toolchain missing
        warnings.warn(f"native DSP unavailable ({e}); using numpy fallbacks")
        _lib = None
    return _lib


def envelope_follow(level: np.ndarray, attack_coef: float, release_coef: float) -> np.ndarray:
    lib = _load()
    if lib is not None:
        level32 = np.ascontiguousarray(level, np.float32)
        out = np.empty_like(level32)
        lib.envelope_follow(
            level32.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            len(level32), ctypes.c_float(attack_coef), ctypes.c_float(release_coef),
        )
        return out.astype(level.dtype)
    from use_tpu.data.dsp import compressor_envelope_np

    return compressor_envelope_np(level, attack_coef, release_coef)


def set_holes(spec: np.ndarray, holes: np.ndarray) -> np.ndarray:
    """Zero rectangular holes in a complex [F, T] spectrogram.

    holes: int64 [n, 4] = (f_idx, t_idx, w_freq, w_time). Mirrors reference
    perturb.py:1593-1611 (numba set_holes).
    """
    lib = _load()
    if lib is not None and spec.dtype == np.complex64:
        ri = np.ascontiguousarray(spec).view(np.float32)
        h = np.ascontiguousarray(holes, np.int64)
        lib.set_holes(
            ri.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            spec.shape[0], spec.shape[1],
            h.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(h),
        )
        return ri.view(np.complex64)
    for f_idx, t_idx, wf, wt in holes:
        spec[max(f_idx - wf, 0) : f_idx + wf, max(t_idx - wt, 0) : t_idx + wt] = 0
    return spec
