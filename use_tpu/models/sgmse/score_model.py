"""ScoreModel: the SGMSE task head (backbone + SDE + STFT + samplers).

Functional re-design of the reference wrapper (reference:
src/models/components/sgmse/model_wrapper.py:23-329): the class holds static
configuration and the Flax backbone; every compute path is a pure function of
(params, batch, rng) so the engine can pjit it directly.

Batch convention (shared with the GAN stack): a dict of arrays with keys
'clean', 'perturbed', and outputs 'enhanced' / 'fake_sde_enhanced' — the
reference's mutable-batch-dict dataflow (SURVEY §1).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.models.registry import BackboneRegistry, SDERegistry
from use_tpu.models.sgmse import sampling
from use_tpu.models.sgmse.sdes import batch_broadcast, crandn
from use_tpu.ops import STFTConfig, istft, pad_spec, spec_back, spec_fwd, stft

Batch = Dict[str, jnp.ndarray]


@dataclass
class ScoreModel:
    """SGMSE score model (model_wrapper.py:23-143).

    condition: 'noisy' | 'denoised' | 'both' — which spectra condition the
        score network (input channels 4 / 4 / 6).
    sde_input: 'noisy' | 'denoised' — prior mean y of the OU process.
    """

    backbone: str = "ncsnpp"
    sde: str = "ouve"
    t_eps: float = 3e-2
    condition: str = "both"
    loss_type: str = "mse"
    n_fft: int = 510
    hop_length: int = 128
    num_frames: int = 256
    window: str = "hann"
    spec_factor: float = 0.15
    spec_abs_exponent: float = 0.5
    sde_input: str = "denoised"
    predictor: str = "reverse_diffusion"
    corrector: str = "none"
    backbone_kwargs: Dict[str, Any] = field(default_factory=dict)
    sde_kwargs: Dict[str, Any] = field(default_factory=dict)

    def __post_init__(self):
        input_channels = 6 if self.condition == "both" else 4
        self.score_net = BackboneRegistry.get_by_name(self.backbone)(
            input_channels=input_channels, **self.backbone_kwargs
        )
        self.sde_obj = SDERegistry.get_by_name(self.sde)(**self.sde_kwargs)
        self.stft_cfg = STFTConfig(
            n_fft=self.n_fft, hop_length=self.hop_length, window=self.window
        )
        self.target_len = (self.num_frames - 1) * self.hop_length

    # -- setup ------------------------------------------------------------
    def init_params(self, rng: jax.Array) -> Any:
        x = jnp.zeros((1, self.stft_cfg.freqs, 64, self.score_net.cfg.input_channels))
        t = jnp.full((1,), 0.5)
        return jax.jit(self.score_net.init)(rng, x, t)["params"]

    def cast_params_for_inference(self, params) -> Any:
        """Pre-cast parameters to the backbone compute dtype.

        With fp32 params and a bf16 compute dtype, Flax re-converts every
        kernel on every sampler step (visible as convert-multiply fusions
        in the profile). Casting once outside the scan removes that
        traffic. GroupNorm affines and the Gaussian-Fourier projection
        stay fp32 (norm statistics and sin/cos phases are fp32 paths).
        """
        if self.score_net.cfg.dtype != "bfloat16":
            return params

        def cast(path, x):
            keys = "/".join(str(getattr(k, "key", k)) for k in path)
            if "GroupNorm" in keys or x.ndim <= 1:
                return x
            if jnp.issubdtype(x.dtype, jnp.floating):
                return x.astype(jnp.bfloat16)
            return x

        return jax.tree_util.tree_map_with_path(cast, params)

    # -- pieces -----------------------------------------------------------
    def _spec(self, wav: jnp.ndarray) -> jnp.ndarray:
        """wav [B, L] -> compressed spec [B, F, T, 2]."""
        return spec_fwd(
            stft(wav, self.stft_cfg), self.spec_factor, self.spec_abs_exponent
        )

    def _inv_spec(self, spec: jnp.ndarray, length: int) -> jnp.ndarray:
        return istft(
            spec_back(spec, self.spec_factor, self.spec_abs_exponent),
            self.stft_cfg,
            length=length,
        )

    def forward_score(
        self, params, x: jnp.ndarray, t: jnp.ndarray, conditioning: List[jnp.ndarray]
    ) -> jnp.ndarray:
        """score = -net(cat([x] + conditioning), t) (model_wrapper.py:135-141)."""
        dnn_input = jnp.concatenate([x] + list(conditioning), axis=-1)
        out = self.score_net.apply({"params": params}, dnn_input, t)  # [B,F,T,1,2]
        return -out[..., 0, :]

    def _select_cond(self, y, y_denoised):
        if self.condition == "noisy":
            return [y]
        if self.condition == "denoised":
            if y_denoised is None:
                raise ValueError("condition='denoised' requires batch['fake']")
            return [y_denoised]
        if self.condition == "both":
            if y_denoised is None:
                raise ValueError("condition='both' requires batch['fake']")
            return [y, y_denoised]
        raise NotImplementedError(f"Unknown conditioning: {self.condition}")

    def _select_sde_input(self, y, y_denoised):
        if self.sde_input == "noisy":
            return y
        if self.sde_input == "denoised":
            if y_denoised is None:
                raise ValueError("sde_input='denoised' requires batch['fake']")
            return y_denoised
        raise NotImplementedError(f"Unknown sde input: {self.sde_input}")

    # -- training ---------------------------------------------------------
    def train_loss(self, params, batch: Batch, rng: jax.Array) -> jnp.ndarray:
        """Denoising score-matching loss (model_wrapper.py:147-208).

        Random 6 s crop -> STFT -> sample t ~ U[t_eps, T] -> perturb with the
        SDE marginal -> MSE on sigma*score + z.
        """
        x, y = batch["clean"], batch["perturbed"]
        y_denoised = batch.get("fake")

        rng_crop, rng_t, rng_z = jax.random.split(rng, 3)
        current_len = x.shape[-1]
        if current_len >= self.target_len:
            start = jax.random.randint(
                rng_crop, (), 0, max(current_len - self.target_len, 1)
            )
            take = lambda w: jax.lax.dynamic_slice_in_dim(
                w, start, self.target_len, axis=-1
            )
        else:
            pad = self.target_len - current_len
            take = lambda w: jnp.pad(w, ((0, 0), (pad // 2, pad - pad // 2)))
        x, y = take(x), take(y)
        if y_denoised is not None:
            y_denoised = take(y_denoised)

        x = self._spec(x)
        y = self._spec(y)
        if y_denoised is not None:
            y_denoised = self._spec(y_denoised)

        sde_input = self._select_sde_input(y, y_denoised)
        t = (
            jax.random.uniform(rng_t, (x.shape[0],))
            * (self.sde_obj.T - self.t_eps)
            + self.t_eps
        )
        mean, std = self.sde_obj.marginal_prob(x, t, sde_input)
        z = crandn(rng_z, x.shape, x.dtype)
        sigmas = batch_broadcast(std, x)
        perturbed = mean + sigmas * z

        conditioning = self._select_cond(y, y_denoised)
        score = self.forward_score(params, perturbed, t, conditioning)
        err = score * sigmas + z

        # complex-aware losses: |err| over the trailing real pair
        if self.loss_type == "mse":
            losses = jnp.sum(jnp.square(err), axis=-1)  # |err|^2
        elif self.loss_type == "mae":
            losses = jnp.sqrt(jnp.sum(jnp.square(err), axis=-1) + 1e-12)
        else:
            raise NotImplementedError(self.loss_type)
        return jnp.mean(0.5 * jnp.sum(losses.reshape(losses.shape[0], -1), axis=-1))

    # -- inference --------------------------------------------------------
    def sample_spec(
        self,
        params,
        y_spec: jnp.ndarray,
        rng: jax.Array,
        conditioning: List[jnp.ndarray],
        sampler_type: str = "pc",
        N: int = 50,
        corrector_steps: int = 1,
        snr: float = 0.5,
        **sampler_kwargs,
    ) -> Tuple[jnp.ndarray, int]:
        """Run the reverse process on padded spectra (jit-friendly core)."""
        score_fn = lambda xt, t: self.forward_score(params, xt, t, conditioning)
        sde = self.sde_obj.copy(N=N)
        if sampler_type == "pc":
            sampler = sampling.get_pc_sampler(
                self.predictor, self.corrector, sde, score_fn, y_spec,
                eps=self.t_eps, snr=snr, corrector_steps=corrector_steps,
            )
        elif sampler_type == "parallel_pc":
            # The window axis multiplies the batch fed to the score network;
            # conditioning must tile accordingly (window-major, matching the
            # [W, B] -> [W*B] reshape inside the sampler).
            base = y_spec.shape[0]

            def score_fn_tiled(xt, t):
                k = xt.shape[0] // base
                cond = [
                    jnp.tile(c, (k,) + (1,) * (c.ndim - 1)) if k > 1 else c
                    for c in conditioning
                ]
                return self.forward_score(params, xt, t, cond)

            sampler = sampling.get_parallel_pc_sampler(
                self.predictor, self.corrector, sde, score_fn_tiled, y_spec,
                eps=self.t_eps, **sampler_kwargs,
            )
        elif sampler_type == "ode":
            sampler = sampling.get_ode_sampler(
                sde, score_fn, y_spec, eps=self.t_eps
            )
        else:
            raise ValueError(f"{sampler_type} is not a valid sampler type!")
        return sampler(rng)

    def sample(
        self,
        params,
        batch: Batch,
        rng: jax.Array,
        sampler_type: str = "pc",
        N: int = 50,
        corrector_steps: int = 1,
        snr: float = 0.5,
        **sampler_kwargs,
    ) -> Batch:
        """Batch-dict enhancement (model_wrapper.py:262-329).

        Writes batch['enhanced'] (sde_input='noisy') or
        batch['fake_sde_enhanced'] (sde_input='denoised', GAN-first hybrid).
        """
        y = batch["perturbed"]
        y_denoised_wav = batch.get("fake")
        t_orig = y.shape[-1]
        params = self.cast_params_for_inference(params)

        y_spec = pad_spec(self._spec(y))
        y_denoised = (
            pad_spec(self._spec(y_denoised_wav)) if y_denoised_wav is not None else None
        )
        conditioning = self._select_cond(y_spec, y_denoised)
        sde_in = self._select_sde_input(y_spec, y_denoised)

        sample, _nfe = self.sample_spec(
            params, sde_in, rng, conditioning, sampler_type, N, corrector_steps,
            snr, **sampler_kwargs,
        )
        enhanced = self._inv_spec(sample, t_orig)
        out = dict(batch)
        if self.sde_input == "denoised":
            out["fake_sde_enhanced"] = enhanced
        else:
            out["enhanced"] = enhanced
        return out

    def sample_chunked(
        self,
        params,
        batch: Batch,
        rng: jax.Array,
        n_chunks: int = 8,
        overlap_frames: int = 32,
        **sample_kwargs,
    ) -> Batch:
        """Single-utterance enhancement as ONE batched sampler call over
        overlapped time chunks, crossfade-joined.

        The batch-1 (interactive enhance(), reference model.py:396-400)
        latency treatment: XLA space-to-batches batch-1 convolutions and
        small batches (2-4) tile pathologically on the v5e MXU, but 8 lanes
        ride the efficient batched serving path — measured 1.458 s vs
        2.50 s full-clip for a 10 s utterance on one chip (1.71x,
        scripts/bench_batch1.py). Chunks overlap by
        overlap_frames*hop_length samples and are linearly crossfaded, so
        each output sample is a convex blend of chunk outputs; quality is
        gated against full-clip sampling on a trained model in
        tests/test_learning.py.
        """
        y = batch["perturbed"]
        if y.ndim != 2 or y.shape[0] != 1:
            raise ValueError(
                f"sample_chunked is the single-utterance path (got batch "
                f"{y.shape[0]}); batched inputs already ride the MXU"
            )
        length = y.shape[-1]
        overlap = int(overlap_frames) * self.hop_length
        hop = -(-length // int(n_chunks))  # ceil
        # hop-aligned chunk starts keep the STFT framing identical per lane
        hop = -(-hop // self.hop_length) * self.hop_length
        n = -(-length // hop)  # actual lanes after alignment
        if n <= 1 or hop <= overlap or overlap <= 0:
            # overlap<=0 would make the crossfade ramps empty ([-0:] slices
            # the whole window) — fall back to full-clip sampling
            return self.sample(params, batch, rng, **sample_kwargs)
        win = hop + overlap
        padded = jnp.pad(
            y[0], (overlap // 2, (n - 1) * hop + win - overlap // 2 - length),
            mode="reflect",
        )
        idx = jnp.arange(n)[:, None] * hop + jnp.arange(win)[None, :]
        chunks = padded[idx]  # [n, win]

        out = self.sample(params, {"perturbed": chunks}, rng, **sample_kwargs)
        key = "fake_sde_enhanced" if self.sde_input == "denoised" else "enhanced"
        enhanced = out[key]  # [n, win]

        ramp = jnp.linspace(0.0, 1.0, overlap + 2)[1:-1]
        w = jnp.ones((win,)).at[:overlap].set(ramp).at[-overlap:].set(ramp[::-1])
        total = (n - 1) * hop + win
        acc = jnp.zeros((total,))
        wacc = jnp.zeros((total,))
        for i in range(n):  # n is small and static; unrolled scatter-adds
            acc = jax.lax.dynamic_update_slice(
                acc, jax.lax.dynamic_slice(acc, (i * hop,), (win,))
                + enhanced[i] * w, (i * hop,)
            )
            wacc = jax.lax.dynamic_update_slice(
                wacc, jax.lax.dynamic_slice(wacc, (i * hop,), (win,)) + w,
                (i * hop,),
            )
        joined = acc / jnp.maximum(wacc, 1e-8)
        result = joined[overlap // 2 : overlap // 2 + length][None]
        res = dict(batch)
        res[key] = result
        return res


def sgmse_large(**overrides) -> ScoreModel:
    """The shipping SGMSE_Large config (configs/model/SGMSE_Large.yaml:1-17)."""
    kw: Dict[str, Any] = dict(
        backbone="ncsnpplarge", sde="ouve", t_eps=3e-2, condition="noisy",
        sde_input="noisy", loss_type="mse", n_fft=1022, hop_length=160,
        num_frames=512, spec_factor=0.15, spec_abs_exponent=0.5,
        predictor="reverse_diffusion", corrector="none",
    )
    kw.update(overrides)
    return ScoreModel(**kw)
