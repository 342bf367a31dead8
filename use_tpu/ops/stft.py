"""Framed STFT / iSTFT as MXU matmuls, numerically matching torch.stft.

TPU-first design notes
----------------------
The reference computes its signal front-end with ``torch.stft(n_fft=1022,
hop_length=160, window=hann, center=True, return_complex=True)`` and the
matching ``torch.istft`` (reference: src/models/components/sgmse/
model_wrapper.py:66-122, src/models/components/feature/stft.py:24-63).

On TPU the fastest exact way to compute a 1022-point real DFT over many
frames is a single dense matmul on the MXU: ``frames [B*T, N] @ dft [N, 2F]``.
N = 1022 is small enough that the O(N^2) matmul costs ~1 GFLOP per second of
audio — noise for the MXU — while avoiding non-power-of-two FFT paths and
keeping everything fusable by XLA. The iSTFT is the transposed matmul plus a
scatter-add overlap-add.

Complex spectra are represented as a trailing real pair ``[..., F, T, 2]``
(channel -1: index 0 = real, 1 = imag) end-to-end; complex dtypes never
enter the compute path.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Windows
# ---------------------------------------------------------------------------

def get_window(window: str, win_length: int) -> np.ndarray:
    """Periodic windows matching torch.hann_window/hamming_window defaults.

    Reference parity: model_wrapper.py:14-20 ('hann' | 'sqrthann'),
    feature/stft.py:85-88 ('hann' | 'hamm').
    """
    n = np.arange(win_length, dtype=np.float64)
    if window in ("hann", "sqrthann"):
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / win_length)
        if window == "sqrthann":
            w = np.sqrt(w)
    elif window == "hamm":
        w = 0.54 - 0.46 * np.cos(2.0 * np.pi * n / win_length)
    else:
        raise NotImplementedError(f"Window type {window} not implemented!")
    return w


@functools.lru_cache(maxsize=None)
def _dft_matrices(n_fft: int, win_length: int, window: str) -> Tuple[np.ndarray, np.ndarray]:
    """Forward windowed real-DFT matrix [N, 2F] and inverse matrix [2F, N].

    Computed once in float64, cached, then cast to float32 device constants.
    Forward:  X_k = sum_n w[n] x[n] e^{-2 pi i n k / N},  k in [0, N//2].
    Inverse:  x[n] = (1/N) (X_0 + 2 sum_{0<k<N/2} Re[X_k e^{2 pi i n k/N}]
                      + X_{N/2} cos(pi n)) * w[n]   (pre-OLA frame synthesis).
    """
    assert win_length <= n_fft
    freqs = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)
    k = np.arange(freqs, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(n, k) / n_fft  # [N, F]

    w = get_window(window, win_length)
    if win_length < n_fft:  # torch center-pads the window to n_fft
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))

    fwd = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)  # [N, 2F]
    fwd = fwd * w[:, None]

    coef = np.full(freqs, 2.0)
    coef[0] = 1.0
    if n_fft % 2 == 0:
        coef[-1] = 1.0
    inv_re = coef[:, None] * np.cos(ang.T) / n_fft  # [F, N]
    inv_im = -coef[:, None] * np.sin(ang.T) / n_fft
    inv = np.concatenate([inv_re, inv_im], axis=0) * w[None, :]  # [2F, N]
    return fwd.astype(np.float32), inv.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _window_sq(n_fft: int, win_length: int, window: str) -> np.ndarray:
    w = get_window(window, win_length)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    return (w * w).astype(np.float32)


# ---------------------------------------------------------------------------
# Config
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class STFTConfig:
    """Static STFT parameters (hashable; safe as a jit static arg)."""

    n_fft: int = 1022
    hop_length: int = 160
    win_length: Optional[int] = None
    window: str = "hann"
    center: bool = True
    pad_mode: str = "reflect"

    @property
    def wl(self) -> int:
        return self.win_length if self.win_length is not None else self.n_fft

    @property
    def freqs(self) -> int:
        return self.n_fft // 2 + 1

    def num_frames(self, length: int) -> int:
        if self.center:
            return 1 + length // self.hop_length
        return 1 + (length - self.n_fft) // self.hop_length


# ---------------------------------------------------------------------------
# STFT / iSTFT
# ---------------------------------------------------------------------------

def _frame_indices(num_frames: int, n_fft: int, hop: int) -> jnp.ndarray:
    return (
        np.arange(num_frames, dtype=np.int32)[:, None] * hop
        + np.arange(n_fft, dtype=np.int32)[None, :]
    )


@functools.partial(jax.jit, static_argnames=("cfg", "precision"))
def stft(x: jnp.ndarray, cfg: STFTConfig = STFTConfig(), precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """STFT of real signal [..., L] -> spectrum [..., F, T, 2].

    Matches torch.stft(center=True, pad_mode='reflect', onesided=True,
    normalized=False, return_complex=True) bit-for-bit up to fp32 rounding.
    """
    batch_shape = x.shape[:-1]
    length = x.shape[-1]
    x = x.reshape((-1, length))

    if cfg.center:
        p = cfg.n_fft // 2
        if cfg.pad_mode == "reflect":
            x = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
        else:
            x = jnp.pad(x, ((0, 0), (p, p)), mode="constant")

    t = cfg.num_frames(length)
    idx = _frame_indices(t, cfg.n_fft, cfg.hop_length)
    frames = x[:, idx]  # [B, T, N]

    fwd, _ = _dft_matrices(cfg.n_fft, cfg.wl, cfg.window)
    spec = jnp.matmul(frames, jnp.asarray(fwd), precision=precision)  # [B, T, 2F]
    f = cfg.freqs
    spec = jnp.stack([spec[..., :f], spec[..., f:]], axis=-1)  # [B, T, F, 2]
    spec = jnp.swapaxes(spec, 1, 2)  # [B, F, T, 2]
    return spec.reshape(batch_shape + spec.shape[1:])


@functools.partial(jax.jit, static_argnames=("cfg", "length", "precision"))
def istft(
    spec: jnp.ndarray,
    cfg: STFTConfig = STFTConfig(),
    length: Optional[int] = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Inverse STFT of [..., F, T, 2] -> [..., L]; matches torch.istft.

    Overlap-add with window-square envelope normalization; center padding
    trimmed; optionally cut/zero-padded to `length`.
    """
    batch_shape = spec.shape[:-3]
    f, t, _ = spec.shape[-3:]
    assert f == cfg.freqs, (f, cfg.freqs)
    spec = spec.reshape((-1, f, t, 2))

    sp = jnp.swapaxes(spec, 1, 2)  # [B, T, F, 2]
    sp = jnp.concatenate([sp[..., 0], sp[..., 1]], axis=-1)  # [B, T, 2F]

    _, inv = _dft_matrices(cfg.n_fft, cfg.wl, cfg.window)
    frames = jnp.matmul(sp, jnp.asarray(inv), precision=precision)  # [B, T, N]

    full = (t - 1) * cfg.hop_length + cfg.n_fft
    idx = _frame_indices(t, cfg.n_fft, cfg.hop_length)  # [T, N]
    sig = jnp.zeros((spec.shape[0], full), frames.dtype)
    sig = sig.at[:, idx.reshape(-1)].add(frames.reshape(frames.shape[0], -1))

    wsq = jnp.asarray(_window_sq(cfg.n_fft, cfg.wl, cfg.window))
    env = jnp.zeros((full,), wsq.dtype)
    env = env.at[idx.reshape(-1)].add(jnp.broadcast_to(wsq, (t, cfg.n_fft)).reshape(-1))
    sig = sig / jnp.where(env > 1e-11, env, 1.0)

    if cfg.center:
        p = cfg.n_fft // 2
        if length is None:
            sig = sig[:, p : full - p]
        else:
            # torch.istft semantics: with an explicit length, only the
            # leading center pad is dropped and `length` samples are taken —
            # trimming the trailing pad first loses up to hop-1 real samples
            # on non-frame-aligned signals (tail reconstructed as zeros).
            sig = sig[:, p : min(p + length, full)]
    if length is not None:
        cur = sig.shape[1]
        if length <= cur:
            sig = sig[:, :length]
        else:
            sig = jnp.pad(sig, ((0, 0), (0, length - cur)))
    return sig.reshape(batch_shape + sig.shape[1:])


# ---------------------------------------------------------------------------
# Magnitude compression (SGMSE spec_fwd / spec_back)
# ---------------------------------------------------------------------------

def spec_fwd(spec: jnp.ndarray, factor: float = 0.15, abs_exponent: float = 0.5) -> jnp.ndarray:
    """|s|^e * e^{i angle(s)} * factor on a real-pair spectrum [..., 2].

    Reference parity: model_wrapper.py:92-96. Computed as s * |s|^(e-1) with
    a zero-safe guard (torch maps 0 -> 0 as well since abs(0)^e = 0).
    """
    if abs_exponent != 1.0:
        # double-where: sqrt must never SEE a zero, or its inf gradient
        # poisons the chain rule as 0*inf=NaN even though the forward value
        # is masked (exact-zero bins are routine — zero-padded frames).
        sq = jnp.sum(jnp.square(spec), axis=-1, keepdims=True)
        mag = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))
        spec = spec * jnp.where(sq > 0, mag ** (abs_exponent - 1.0), 0.0)
    return spec * factor


def spec_back(spec: jnp.ndarray, factor: float = 0.15, abs_exponent: float = 0.5) -> jnp.ndarray:
    """Inverse of spec_fwd (model_wrapper.py:98-103)."""
    spec = spec / factor
    if abs_exponent != 1.0:
        sq = jnp.sum(jnp.square(spec), axis=-1, keepdims=True)
        mag = jnp.sqrt(jnp.where(sq > 0, sq, 1.0))  # see spec_fwd
        spec = spec * jnp.where(sq > 0, mag ** (1.0 / abs_exponent - 1.0), 0.0)
    return spec


def pad_spec(spec: jnp.ndarray, multiple: int = 64) -> jnp.ndarray:
    """Zero-pad the time-frame axis of [..., F, T, C] to a multiple.

    Reference parity: util/other.py:128-135 (pads T to T%64==0 for U-Net depth).
    """
    t = spec.shape[-2]
    num_pad = (-t) % multiple
    if num_pad == 0:
        return spec
    pad = [(0, 0)] * spec.ndim
    pad[-2] = (0, num_pad)
    return jnp.pad(spec, pad)


# ---------------------------------------------------------------------------
# Complex-pair helpers
# ---------------------------------------------------------------------------

def to_complex(pair: jnp.ndarray) -> jnp.ndarray:
    """[..., 2] real pair -> complex."""
    return jax.lax.complex(pair[..., 0], pair[..., 1])


def from_complex(z: jnp.ndarray) -> jnp.ndarray:
    """complex -> [..., 2] real pair."""
    return jnp.stack([jnp.real(z), jnp.imag(z)], axis=-1)
