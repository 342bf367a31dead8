"""Legacy sp-uhh model family (kept for API parity with the reference).

Re-implementation of the programmatically-reachable legacy models (reference:
src/models/components/sgmse/model.py:25-1010):

- LegacyScoreModel: score model with EMA of parameters (torch_ema analog,
  model.py:63,106-139) and an `enhance()` API with RTF timing
  (model.py:357-402).
- DiscriminativeModel: the backbone run deterministically with an MSE
  spectral loss (model.py:405-461).
- StochasticRegenerationModel: denoiser + score network composed — the
  denoiser output conditions the reverse SDE (condition='both'/'denoised',
  sde_input='denoised'), N=30 default enhancement (model.py:464-1010).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.models.sgmse.score_model import ScoreModel
from use_tpu.ops import pad_spec


@dataclass
class EMA:
    """Exponential moving average of a pytree (torch_ema semantics:
    ema = decay*ema + (1-decay)*param, update after each optimizer step)."""

    decay: float = 0.999

    def init(self, params):
        return jax.tree.map(jnp.copy, params)

    def update(self, ema_params, params):
        d = self.decay
        return jax.tree.map(lambda e, p: d * e + (1 - d) * p, ema_params, params)


class LegacyScoreModel(ScoreModel):
    """ScoreModel + EMA bookkeeping + enhance(timeit) (model.py:25-402)."""

    def __init__(self, *args, ema_decay: float = 0.999, **kwargs):
        super().__init__(*args, **kwargs)
        self.ema = EMA(ema_decay)

    def enhance(
        self,
        params,
        y: jnp.ndarray,
        rng: jax.Array,
        sampler_type: str = "pc",
        N: int = 30,
        corrector_steps: int = 1,
        snr: float = 0.5,
        timeit: bool = False,
    ):
        """Single-utterance enhancement; optionally returns (x_hat, nfe, rtf)
        (model.py:357-402)."""
        start = time.time()
        batch = {"perturbed": y if y.ndim == 2 else y[None]}
        out = self.sample(
            params, batch, rng, sampler_type=sampler_type, N=N,
            corrector_steps=corrector_steps, snr=snr,
        )
        x_hat = out["enhanced"]
        if y.ndim == 1:
            x_hat = x_hat[0]
        if timeit:
            jax.block_until_ready(x_hat)
        nfe = N * (corrector_steps + (0 if self.corrector == "none" else 0) + 1) \
            if self.corrector != "none" else N
        if timeit:
            sr = 24000
            rtf = (time.time() - start) / (np.prod(y.shape[-1:]) / sr)
            return x_hat, nfe, rtf
        return x_hat


@dataclass
class DiscriminativeModel:
    """Deterministic enhancement with a complex-MSE spectral loss
    (model.py:405-461)."""

    backbone: str = "ncsnpp"
    n_fft: int = 510
    hop_length: int = 128
    num_frames: int = 256
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    backbone_kwargs: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        from use_tpu.models.gan.generator import NCSNPPWrapper

        self.wrapper = NCSNPPWrapper(
            n_fft=self.n_fft, hop_length=self.hop_length,
            num_frames=self.num_frames, spec_factor=self.spec_factor,
            spec_abs_exponent=self.spec_abs_exponent, backbone=self.backbone,
            backbone_kwargs=self.backbone_kwargs,
        )

    def init_params(self, rng):
        return self.wrapper.init_params(rng)

    def train_loss(self, params, batch, rng):
        out = self.wrapper.forward_train(params, batch, rng)
        err = out["fake"] - out["clean"]
        return jnp.mean(0.5 * jnp.sum(jnp.square(err), axis=-1))

    def enhance(self, params, y: jnp.ndarray):
        out = self.wrapper.forward_infer(params, {"perturbed": y})
        return out["fake"]


@dataclass
class StochasticRegenerationModel:
    """Denoiser -> score model joint system (model.py:464-1010).

    The denoiser's output becomes batch['fake'], which the score model uses
    as conditioning (condition='both') and as the reverse-SDE prior mean
    (sde_input='denoised') — the reference's regen mode.
    """

    denoiser: Any = None  # NCSNPPWrapper-like (params, batch) -> batch['fake']
    score: ScoreModel = None

    def __post_init__(self):
        from use_tpu.models.gan.generator import NCSNPPWrapper

        if self.denoiser is None:
            self.denoiser = NCSNPPWrapper()
        if self.score is None:
            self.score = ScoreModel(condition="both", sde_input="denoised")

    def init_params(self, rng) -> Tuple[Any, Any]:
        r1, r2 = jax.random.split(rng)
        return self.denoiser.init_params(r1), self.score.init_params(r2)

    def train_loss(self, params: Tuple[Any, Any], batch, rng):
        """Joint training: the score loss conditioned on the denoiser output
        (model.py regen-joint-training mode)."""
        d_params, s_params = params
        r1, r2 = jax.random.split(rng)
        batch = self.denoiser.forward_train(d_params, batch, r1)
        return self.score.train_loss(s_params, batch, r2)

    def enhance(
        self, params: Tuple[Any, Any], y: jnp.ndarray, rng: jax.Array,
        N: int = 30, **kw,
    ):
        """Two-stage enhancement (model.py:939 default N=30)."""
        d_params, s_params = params
        batch = self.denoiser.forward_infer(d_params, {"perturbed": y})
        out = self.score.sample(s_params, batch, rng, N=N, **kw)
        return out["fake_sde_enhanced"]
