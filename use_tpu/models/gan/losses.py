"""GAN criteria: LS-GAN adversarial, feature matching, multi-resolution
spectral reconstruction.

Re-implementation of the reference criteria (reference:
loss_function/monaural_loss.py:14-321 and
hifigan_dicriminator.py:257-312) over nested [bank][disc] logit/feature
lists and [B, T] waveforms. All criteria read/write the mutable batch dict
with `loss_*` keys, preserving the reference dataflow.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import jax.numpy as jnp

from use_tpu.ops.mel import MelConfig, melspectrogram, spectrogram
from use_tpu.ops.stft import STFTConfig


def _mse_to(logits, target: float) -> jnp.ndarray:
    return jnp.mean(jnp.square(logits - target))


def adv_gen_loss(fake_logits: List[List[jnp.ndarray]]) -> jnp.ndarray:
    """MSE-to-1 averaged over every bank/disc (hifigan_dicriminator.py:257-272)."""
    total, cnt = 0.0, 0
    for bank in fake_logits:
        for lg in bank:
            total = total + _mse_to(lg, 1.0)
            cnt += 1
    return total / cnt


def adv_dsc_loss(real_logits, fake_logits) -> jnp.ndarray:
    """real->1, fake->0 (hifigan_dicriminator.py:294-312)."""
    total, cnt = 0.0, 0
    for bank_r, bank_f in zip(real_logits, fake_logits):
        for lr_, lf in zip(bank_r, bank_f):
            total = total + _mse_to(lr_, 1.0) + _mse_to(lf, 0.0)
            cnt += 2
    return total / cnt


def feat_match_loss(real_feats, fake_feats) -> jnp.ndarray:
    """L1 feature matching over every layer (hifigan_dicriminator.py:275-292)."""
    total, cnt = 0.0, 0
    for bank_r, bank_f in zip(real_feats, fake_feats):
        for disc_r, disc_f in zip(bank_r, bank_f):
            for fr, ff in zip(disc_r, disc_f):
                total = total + jnp.mean(jnp.abs(ff - fr))
                cnt += 1
    return total / cnt


@dataclass(frozen=True)
class WavSpecConvergenceConfig:
    """Multi-resolution reconstruction config (monaural_loss.py:59-116).

    Frame lengths scale with sampling_rate/48000 as in the reference.
    """

    sampling_rate: int = 24000
    alpha_wav_l1: float = 1.0
    alpha_mag_l2: float = 1.0
    alpha_mag_log: float = 1.0
    alpha_mag_norm_l2: float = 1.0
    alpha_mel_log: float = 1.0
    alpha_mel_l2: float = 1.0

    @property
    def stft_cfgs(self) -> Tuple[STFTConfig, ...]:
        ratio = self.sampling_rate / 48000.0
        return tuple(
            STFTConfig(n_fft=int(fl * ratio), hop_length=int(fl * ratio) // 4)
            for fl in (512, 1024, 2048, 4096)
        )

    @property
    def mel_cfg(self) -> MelConfig:
        sr = self.sampling_rate
        return MelConfig(
            sample_rate=sr, f_min=0.0, f_max=sr // 2, n_fft=2048,
            win_length=int(0.025 * sr), hop_length=int(0.010 * sr), n_mels=128,
        )


def wav_spec_convergence(
    clean: jnp.ndarray, enhanced: jnp.ndarray, cfg: WavSpecConvergenceConfig
) -> Dict[str, jnp.ndarray]:
    """wav L1 + 4-res STFT (mag L2 / log-mag L1 / spectral convergence) +
    mel (log L1 / L2) (monaural_loss.py:117-151)."""
    wav_l1 = jnp.mean(jnp.abs(enhanced - clean))

    mag_l2 = 0.0
    mag_log = 0.0
    mag_norm = 0.0
    for scfg in cfg.stft_cfgs:
        me = spectrogram(enhanced, scfg)
        mc = spectrogram(clean, scfg)
        mag_l2 = mag_l2 + jnp.mean(jnp.square(me - mc))
        mag_log = mag_log + jnp.mean(
            jnp.abs(jnp.log(me * 32768 + 1e-6) - jnp.log(mc * 32768 + 1e-6))
        )
        # eps inside the sqrts: their gradients are x/||x||, NaN at exact 0
        num = jnp.sqrt(jnp.sum(jnp.square(mc - me), axis=(-2, -1)) + 1e-12)
        den = jnp.sqrt(jnp.sum(jnp.square(mc), axis=(-2, -1)) + 1e-12) + 1e-6
        mag_norm = mag_norm + jnp.mean(num / den)
    n = len(cfg.stft_cfgs)
    mag_log = mag_log / n
    mag_norm = mag_norm / n

    mel_e = melspectrogram(enhanced, cfg.mel_cfg)
    mel_c = melspectrogram(clean, cfg.mel_cfg)
    mel_log = jnp.mean(
        jnp.abs(jnp.log(mel_e * 32768 + 1e-6) - jnp.log(mel_c * 32768 + 1e-6))
    )
    mel_l2 = jnp.mean(jnp.square(mel_e - mel_c))

    return {
        "wav_l1": cfg.alpha_wav_l1 * wav_l1,
        "mag_l2": cfg.alpha_mag_l2 * mag_l2,
        "mag_log": cfg.alpha_mag_log * mag_log,
        "mag_norm_l2": cfg.alpha_mag_norm_l2 * mag_norm,
        "mel_log": cfg.alpha_mel_log * mel_log,
        "mel_l2": cfg.alpha_mel_l2 * mel_l2,
    }


@dataclass(frozen=True)
class HifiganGLossConfig(WavSpecConvergenceConfig):
    """Full LSGAN generator criterion (monaural_loss.py:181-321).

    Shipping weights: configs/model/LSGAN.yaml:29-41.
    """

    alpha_adv_gen: float = 1.0
    alpha_adv_feat: float = 1.0
    enhanced_key: str = "fake"


def hifigan_g_loss(batch: Dict, cfg: HifiganGLossConfig) -> Dict:
    """Writes loss_G_* keys + total loss_G into the batch dict."""
    key = cfg.enhanced_key
    parts = wav_spec_convergence(batch["clean"], batch[key], cfg)
    adv = cfg.alpha_adv_gen * adv_gen_loss(batch[f"predicted_{key}_logits"])
    feat = cfg.alpha_adv_feat * feat_match_loss(
        batch["predicted_clean_feature_list"],
        batch[f"predicted_{key}_feature_list"],
    )
    out = dict(batch)
    for name, v in parts.items():
        out[f"loss_G_{name}"] = v
    out["loss_G_adv_gen"] = adv
    out["loss_G_adv_feat"] = feat
    out["loss_G"] = sum(parts.values()) + adv + feat
    return out


def hifigan_d_loss(batch: Dict, enhanced_key: str = "fake") -> Dict:
    """HIFIGAN_Vocoder_D_Loss (monaural_loss.py:44-56)."""
    loss = adv_dsc_loss(
        batch["predicted_clean_logits"], batch[f"predicted_{enhanced_key}_logits"]
    )
    out = dict(batch)
    out["loss_D_adv_dsc"] = loss
    out["loss_D"] = loss
    return out


def lsgan_g_loss(batch: Dict) -> Dict:
    """Plain LSGAN G loss, summed not averaged (monaural_loss.py:14-24)."""
    loss = 0.0
    for bank in batch["predicted_fake_logits"]:
        for lg in bank:
            loss = loss + _mse_to(lg, 1.0)
    out = dict(batch)
    out["loss_G"] = loss
    return out


def lsgan_d_loss(batch: Dict) -> Dict:
    """Plain LSGAN D loss (monaural_loss.py:27-41)."""
    loss = 0.0
    for bank_f, bank_r in zip(
        batch["predicted_fake_logits"], batch["predicted_clean_logits"]
    ):
        for lf, lr_ in zip(bank_f, bank_r):
            loss = loss + _mse_to(lf, 0.0) + _mse_to(lr_, 1.0)
    out = dict(batch)
    out["loss_D"] = loss
    return out


def content_criteria(
    y_pred: jnp.ndarray, y_true: jnp.ndarray, sampling_rate: int = 48000
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """HiFi-GAN+ BWE content losses (reference GAN/discriminator/hifigan/
    criteria.py:10-59): L1 on the raw waveform, mean L1 over log-magnitude
    STFTs at frame lengths 512/1024/2048/4096, and L1 on the log-mel
    spectrogram (128 mels, 25 ms window / 10 ms hop, f_min=4 kHz at 48 k).

    Returns (wav_loss, stft_loss, melspec_loss) like the reference forward.
    """
    wav_loss = jnp.mean(jnp.abs(y_pred - y_true))

    stft_loss = 0.0
    frame_lengths = (512, 1024, 2048, 4096)
    for fl in frame_lengths:
        scfg = STFTConfig(n_fft=fl, hop_length=fl // 4)
        s_true = jnp.log(spectrogram(y_true, scfg) + 1e-5)
        s_pred = jnp.log(spectrogram(y_pred, scfg) + 1e-5)
        stft_loss = stft_loss + jnp.mean(jnp.abs(s_pred - s_true))
    stft_loss = stft_loss / len(frame_lengths)

    mel_cfg = MelConfig(
        sample_rate=sampling_rate,
        f_min=8000 // 2 if sampling_rate == 48000 else 0.0,
        f_max=sampling_rate // 2, n_fft=2048,
        win_length=int(0.025 * sampling_rate),
        hop_length=int(0.010 * sampling_rate), n_mels=128,
    )
    m_true = jnp.log(melspectrogram(y_true, mel_cfg) + 1e-5)
    m_pred = jnp.log(melspectrogram(y_pred, mel_cfg) + 1e-5)
    melspec_loss = jnp.mean(jnp.abs(m_pred - m_true))
    return wav_loss, stft_loss, melspec_loss
