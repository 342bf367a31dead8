"""Batch-dict STFT front-end (the generic feature extractor).

Re-implementation of the reference STFTFeature (reference:
src/models/components/feature/stft.py:66-240): computes [B, F, T, 2]
spectra for 'perturbed'/'clean', optional high-frequency zeroing, magnitude
compression (sqrt / cubic / log_1x), mag/phase splitting, subband splitting,
speech-mask + spectra-length bookkeeping; inverse() undoes compression and
iSTFTs every key in inverse_keys.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp

from use_tpu.ops.stft import STFTConfig, istft, stft


def mag_phase(spec: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 2] -> (magnitude, phase-angle) (stft.py:10-14).

    The tiny epsilon inside the sqrt keeps d|s|/ds = s/|s| defined at the
    exact-zero bins produced by zero-padded frames (0/0 = NaN otherwise)."""
    mag = jnp.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2 + 1e-24)
    return mag, jnp.arctan2(spec[..., 1], spec[..., 0])


def mag_unit_phase(spec: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 2] -> (magnitude, unit-phase pair) (stft.py:17-21)."""
    mag = jnp.sqrt(spec[..., 0] ** 2 + spec[..., 1] ** 2 + 1e-24)
    return mag, spec / (mag[..., None] + 1e-9)


def _compress(mag: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "sqrt":
        return mag ** 0.5
    if mode == "cubic":
        return mag ** 0.3
    if mode == "log_1x":
        return jnp.log(mag + 1.0)
    raise ValueError(mode)


def _decompress(mag: jnp.ndarray, mode: str) -> jnp.ndarray:
    if mode == "sqrt":
        return mag ** 2
    if mode == "cubic":
        return mag ** (1 / 0.3)
    if mode == "log_1x":
        return jnp.exp(mag) - 1.0
    raise ValueError(mode)


@dataclass
class STFTFeature:
    n_fft: int = 512
    win_length: int = 512
    hop_length: int = 128
    window: str = "hann"
    use_mag_phase: bool = False
    freq_high: Optional[float] = None
    sampling_rate: int = 16000
    compression: Optional[str] = None
    split_subbands: Optional[int] = None
    inverse_keys: List[str] = field(default_factory=lambda: ["fake"])

    def __post_init__(self):
        self.cfg = STFTConfig(
            n_fft=self.n_fft, hop_length=self.hop_length,
            win_length=self.win_length, window=self.window, center=True,
        )
        self.high_cut_index = (
            int(self.freq_high / self.sampling_rate * self.n_fft + 0.5)
            if self.freq_high else None
        )

    def _process_key(self, batch: Dict, key: str, out: Dict) -> None:
        spec = stft(batch[key], self.cfg)  # [B, F, T, 2]
        if self.high_cut_index is not None:
            mask = jnp.arange(spec.shape[1]) <= self.high_cut_index
            spec = spec * mask[None, :, None, None]
        if self.compression is not None:
            mag, unit = mag_unit_phase(spec)
            spec = _compress(mag, self.compression)[..., None] * unit
        if not self.use_mag_phase:
            out[f"{key}_spectra"] = spec
        else:
            mag, phase = mag_phase(spec)
            out[f"{key}_mag"], out[f"{key}_phase"] = mag, phase
        if self.split_subbands:
            band = self.n_fft // 2 // self.split_subbands
            subs = [
                spec[:, i * band : (i + 1) * band + 1]
                for i in range(self.split_subbands)
            ]
            out[f"{key}_subband_spectra"] = jnp.stack(subs, axis=1)
        return spec

    def __call__(self, batch: Dict) -> Dict:
        out = dict(batch)
        spec = self._process_key(batch, "perturbed", out)
        mag, _ = mag_phase(spec if not self.use_mag_phase else stft(batch["perturbed"], self.cfg))
        if "sample_length" in batch:
            lengths = batch["sample_length"]
            spectra_length = (lengths // self.hop_length + 1).astype(jnp.int32)
            t_idx = jnp.arange(mag.shape[-1])
            out["speech_mask"] = (
                t_idx[None, None, :] < spectra_length[:, None, None]
            ).astype(mag.dtype) * jnp.ones_like(mag)
            out["spectra_length"] = spectra_length
        if "clean" in batch:
            self._process_key(batch, "clean", out)
        return out

    def inverse(self, batch: Dict) -> Dict:
        out = dict(batch)
        length = batch["perturbed"].shape[-1]
        for key in self.inverse_keys:
            if self.split_subbands:
                band = self.n_fft // 2 // self.split_subbands
                sub = batch[f"{key}_subband_spectra"]
                parts = [
                    sub[:, i, :band] if i < self.split_subbands - 1 else sub[:, i]
                    for i in range(self.split_subbands)
                ]
                out[f"{key}_spectra"] = jnp.concatenate(parts, axis=1)
                batch = {**batch, f"{key}_spectra": out[f"{key}_spectra"]}
            if not self.use_mag_phase:
                spec = batch[f"{key}_spectra"]
                if self.compression is not None:
                    mag, unit = mag_unit_phase(spec)
                    spec = _decompress(mag, self.compression)[..., None] * unit
            else:
                mag, phase = batch[f"{key}_mag"], batch[f"{key}_phase"]
                if self.compression is not None:
                    mag = _decompress(mag, self.compression)
                spec = jnp.stack(
                    [mag * jnp.cos(phase), mag * jnp.sin(phase)], axis=-1
                )
            out[key] = istft(spec, self.cfg, length=length)
        return out
