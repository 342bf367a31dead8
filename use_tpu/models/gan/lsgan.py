"""LSGAN task: pairs the generator, discriminator bank and criteria into the
g_forward / d_loss / g_loss interface consumed by engine.train.make_gan_train_step.

Mirrors GANModule's manual-optimization loop semantics (reference:
src/models/LSGAN_module.py:75-119) as pure functions of params.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from use_tpu.models.gan import losses
from use_tpu.models.gan.discriminators import HifiganVocoderDiscriminator24kMVD
from use_tpu.models.gan.generator import NCSNPPWrapper

Batch = Dict[str, jnp.ndarray]


@dataclass
class LSGAN:
    """The shipping LSGAN configuration (configs/model/LSGAN.yaml)."""

    generator: NCSNPPWrapper = None
    discriminator: Any = None
    g_loss_cfg: losses.HifiganGLossConfig = None
    enhanced_key: str = "fake"

    def __post_init__(self):
        if self.generator is None:
            self.generator = NCSNPPWrapper()
        if self.discriminator is None:
            self.discriminator = HifiganVocoderDiscriminator24kMVD()
        if self.g_loss_cfg is None:
            self.g_loss_cfg = losses.HifiganGLossConfig(
                sampling_rate=24000, alpha_wav_l1=0.1, alpha_mag_l2=1.0,
                alpha_mag_log=1.0, alpha_mag_norm_l2=0.5, alpha_mel_log=0.5,
                alpha_mel_l2=0.5, alpha_adv_gen=1.0, alpha_adv_feat=10.0,
                enhanced_key=self.enhanced_key,
            )

    # -- setup --------------------------------------------------------------
    def init_params(self, rng: jax.Array, wav_len: int = None) -> Tuple[Any, Any]:
        rng_g, rng_d = jax.random.split(rng)
        g_params = self.generator.init_params(rng_g)
        wav_len = wav_len or self.generator.target_len
        d_params = self.discriminator.init(
            rng_d, jnp.zeros((1, wav_len))
        )["params"]
        return g_params, d_params

    # -- engine interface ----------------------------------------------------
    def g_forward(self, g_params, batch: Batch, rng: jax.Array) -> Batch:
        return self.generator(g_params, batch, rng, train=True)

    def _disc_batch(self, d_params, batch: Batch) -> Batch:
        """forward_fake + forward_real (hifigan_dicriminator.py:228-249)."""
        key = self.enhanced_key
        lg_f, fm_f = self.discriminator.apply({"params": d_params}, batch[key])
        lg_r, fm_r = self.discriminator.apply({"params": d_params}, batch["clean"])
        out = dict(batch)
        out[f"predicted_{key}_logits"] = lg_f
        out[f"predicted_{key}_feature_list"] = fm_f
        out["predicted_clean_logits"] = lg_r
        out["predicted_clean_feature_list"] = fm_r
        return out

    def d_loss(self, d_params, batch: Batch) -> jnp.ndarray:
        batch = self._disc_batch(d_params, batch)
        batch = losses.hifigan_d_loss(batch, self.enhanced_key)
        return batch["loss_D"]

    def g_loss(self, d_params, batch: Batch):
        batch = self._disc_batch(d_params, batch)
        batch = losses.hifigan_g_loss(batch, self.g_loss_cfg)
        logs = {k: v for k, v in batch.items() if k.startswith("loss_G")}
        return batch["loss_G"], logs

    # -- inference ------------------------------------------------------------
    def enhance(self, g_params, batch: Batch) -> Batch:
        return self.generator(g_params, batch, train=False)
