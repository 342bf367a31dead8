"""LSGAN generator: NCSN++ (discriminative) behind the STFT front-end.

Re-design of the reference NCSNPP_Wrapper (reference:
GAN/generator/ncsnpp/model_wrapper.py:19-123): training path random-crops
clean+noisy to (num_frames-1)*hop samples, runs the discriminative NCSN++ on
the compressed spectrogram and writes batch['fake']; inference path pads the
frame axis to a multiple of 64 and restores the original length.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict

import jax
import jax.numpy as jnp

from use_tpu.models.registry import BackboneRegistry, GeneratorRegistry
from use_tpu.ops import STFTConfig, istft, pad_spec, spec_back, spec_fwd, stft

Batch = Dict[str, jnp.ndarray]


@dataclass
class NCSNPPWrapper:
    """Shipping LSGAN G config: configs/model/LSGAN.yaml:44-50."""

    n_fft: int = 1022
    hop_length: int = 160
    num_frames: int = 480
    window: str = "hann"
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    backbone: str = "ncsnpp"
    backbone_kwargs: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        self.net = BackboneRegistry.get_by_name(self.backbone)(
            discriminative=True, **self.backbone_kwargs
        )
        self.stft_cfg = STFTConfig(
            n_fft=self.n_fft, hop_length=self.hop_length, window=self.window
        )
        self.target_len = (self.num_frames - 1) * self.hop_length

    def init_params(self, rng: jax.Array) -> Any:
        x = jnp.zeros((1, self.stft_cfg.freqs, 64, 2))
        return self.net.init(rng, x, None)["params"]

    def _spec(self, wav):
        return spec_fwd(
            stft(wav, self.stft_cfg), self.spec_factor, self.spec_abs_exponent
        )

    def _inv(self, spec, length):
        return istft(
            spec_back(spec, self.spec_factor, self.spec_abs_exponent),
            self.stft_cfg, length=length,
        )

    def _apply_net(self, params, y_spec):
        out = self.net.apply({"params": params}, y_spec, None)  # [B,F,T,1,2]
        return out[..., 0, :]

    def forward_train(self, params, batch: Batch, rng: jax.Array) -> Batch:
        """Random-crop + enhance; writes cropped clean/perturbed + fake
        (model_wrapper.py:88-113)."""
        x, y = batch["clean"], batch["perturbed"]
        current_len = x.shape[-1]
        if current_len >= self.target_len:
            start = jax.random.randint(
                rng, (), 0, max(current_len - self.target_len, 1)
            )
            take = lambda w: jax.lax.dynamic_slice_in_dim(
                w, start, self.target_len, axis=-1
            )
        else:
            pad = self.target_len - current_len
            take = lambda w: jnp.pad(w, ((0, 0), (pad // 2, pad - pad // 2)))
        x, y = take(x), take(y)

        y_spec = self._spec(y)
        fake_spec = self._apply_net(params, y_spec)
        fake = self._inv(fake_spec, self.target_len)

        out = dict(batch)
        out["clean"], out["perturbed"], out["fake"] = x, y, fake
        return out

    def forward_infer(self, params, batch: Batch) -> Batch:
        """Full-utterance enhancement (model_wrapper.py:114-122)."""
        y = batch["perturbed"]
        t_orig = y.shape[-1]
        y_spec = pad_spec(self._spec(y))
        fake_spec = self._apply_net(params, y_spec)
        out = dict(batch)
        out["fake"] = self._inv(fake_spec, t_orig)
        return out

    def __call__(self, params, batch: Batch, rng=None, train: bool = False) -> Batch:
        if train and "clean" in batch:
            return self.forward_train(params, batch, rng)
        return self.forward_infer(params, batch)


GeneratorRegistry.register("ncsnpp_wrapper")(NCSNPPWrapper)
