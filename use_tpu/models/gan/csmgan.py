"""CSMGAN: causal/streaming STFT U-Net generator, in Flax.

Re-implementation of the reference's alternative generator (reference:
GAN/generator/CSMGAN/generator5_24k.py:12-788): GLFB blocks (gated depthwise
conv + channel-SE + freq-SE with cumulative layer norm), a causal TCN
bottleneck over the flattened C x F axis, PixelShuffle frequency-upsampling
decoder, and causal 2-D convolutions throughout (left-padded in time,
symmetric in frequency) so the network is streamable.

Layout: activations are [B, T, F, C] (time first so causal padding is the
leading spatial axis). The wrapper owns the 481-bin STFTFeature front-end
and consumes/produces the batch dict like the reference
(CSMGAN_Wrapper.forward:747-761).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from use_tpu.models.registry import GeneratorRegistry

EPS = 1e-6


def _cumulative_stats(sums: jnp.ndarray, pow_sums: jnp.ndarray, per_step: int, axis: int):
    """Cumulative mean/std over a time axis given per-step channel sums."""
    cum_sum = jnp.cumsum(sums, axis=axis)
    cum_pow = jnp.cumsum(pow_sums, axis=axis)
    t = sums.shape[axis]
    shape = [1] * sums.ndim
    shape[axis] = t
    cnt = (np.arange(1, t + 1, dtype=np.float32) * per_step).reshape(shape)
    mean = cum_sum / cnt
    # clamp: the E[x^2]-E[x]^2 form can go slightly negative under
    # catastrophic cancellation, and sqrt(negative) poisons training
    var = jnp.maximum(cum_pow / cnt - mean ** 2, 0.0)
    return mean, var


def _stream_cum_stats(mod: nn.Module, sums: jnp.ndarray, pow_sums: jnp.ndarray, per_step: int):
    """Streaming cumulative stats: continue from carried (sum, pow, count).

    `sums`/`pow_sums` are per-frame reductions with time on axis 1; the
    carried totals live in the module's 'stream' collection so chunked
    processing is numerically identical to one offline pass (up to fp
    reassociation of the cumsum)."""
    carry_shape = (sums.shape[0], 1) + sums.shape[2:]
    s = mod.variable("stream", "sum", jnp.zeros, carry_shape, jnp.float32)
    p = mod.variable("stream", "pow", jnp.zeros, carry_shape, jnp.float32)
    n = mod.variable("stream", "cnt", jnp.zeros, (), jnp.float32)
    cum_sum = s.value + jnp.cumsum(sums, axis=1)
    cum_pow = p.value + jnp.cumsum(pow_sums, axis=1)
    t = sums.shape[1]
    steps = jnp.arange(1, t + 1, dtype=jnp.float32).reshape(
        (1, t) + (1,) * (sums.ndim - 2)
    )
    cnt = (n.value + steps) * per_step
    mean = cum_sum / cnt
    var = jnp.maximum(cum_pow / cnt - mean ** 2, 0.0)
    s.value = cum_sum[:, -1:]
    p.value = cum_pow[:, -1:]
    n.value = n.value + t
    return mean, var


def _stream_context(mod: nn.Module, x: jnp.ndarray, ctx: int):
    """Prepend `ctx` carried time steps (axis 1) to x; carry the new tail.

    The streaming replacement for causal left zero-padding: the buffer holds
    the previous chunk's last `ctx` steps, so chunk-wise outputs equal the
    offline causal convolution exactly."""
    buf = mod.variable(
        "stream", "ctx", jnp.zeros, (x.shape[0], ctx) + x.shape[2:], x.dtype
    )
    ext = jnp.concatenate([buf.value, x], axis=1)
    buf.value = ext[:, -ctx:]
    return ext


class CumLN1d(nn.Module):
    """Cumulative layer norm over [B, T, C] (generator5_24k.py cLN:12-49)."""

    eps: float = 1e-8
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gain = self.param("gain", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        sums = jnp.sum(x, -1, keepdims=True)
        pows = jnp.sum(x ** 2, -1, keepdims=True)
        if self.stream:
            mean, var = _stream_cum_stats(self, sums, pows, c)
        else:
            mean, var = _cumulative_stats(sums, pows, c, 1)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gain + bias


class CumLN2d(nn.Module):
    """Cumulative layer norm over [B, T, F, C] (CumLN2d:342-362)."""

    eps: float = EPS
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,))
        beta = self.param("beta", nn.initializers.zeros, (c,))
        sums = jnp.sum(x, -1, keepdims=True)
        pows = jnp.sum(x ** 2, -1, keepdims=True)
        if self.stream:
            mean, var = _stream_cum_stats(self, sums, pows, c)
        else:
            mean, var = _cumulative_stats(sums, pows, c, 1)
        return (x - mean) * jax.lax.rsqrt(var + self.eps) * gamma + beta


class CausalConv2d(nn.Module):
    """Conv with left-only time padding, symmetric freq padding (:365-389)."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = True
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kt, kf = self.kernel_size
        pt = (kt - 1) * self.dilation[0]
        pf = (kf - 1) * self.dilation[1] // 2
        if self.stream and pt > 0:
            x = _stream_context(self, x, pt)
            x = jnp.pad(x, ((0, 0), (0, 0), (pf, pf), (0, 0)))
        else:
            x = jnp.pad(x, ((0, 0), (pt, 0), (pf, pf), (0, 0)))
        return nn.Conv(
            self.features, self.kernel_size, strides=self.strides, padding="VALID",
            kernel_dilation=self.dilation, feature_group_count=self.groups,
            use_bias=self.use_bias,
        )(x)


def gate(x: jnp.ndarray) -> jnp.ndarray:
    a, g = jnp.split(x, 2, axis=-1)
    return a * jax.nn.sigmoid(g)


class SeChannelModule(nn.Module):
    """Freq-pooled channel attention with causal time smoothing (:458-471)."""

    channels: int
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        pooled = jnp.mean(x, axis=2, keepdims=True)  # [B, T, 1, C]
        smoothed = CausalConv2d(
            self.channels, (3, 1), use_bias=False, stream=self.stream
        )(pooled)
        return x * smoothed


class SeFreqModule(nn.Module):
    """Channel-pooled frequency attention (:474-489)."""

    freq_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # pool over channels -> [B, T, F]; treat F as channels for the 1x1
        pooled = jnp.mean(x, axis=-1)[:, :, None, :]  # [B, T, 1, F]
        smoothed = CausalConv2d(self.freq_dim, (1, 1), use_bias=False)(pooled)
        return x * jnp.swapaxes(smoothed, 2, 3)  # [B, T, F, 1] broadcast


def get_norm(norm: str, stream: bool = False):
    if norm == "CLN":
        return lambda: CumLN2d(stream=stream)
    if stream:
        # BN/IN substitutes normalize over the full T axis — not causal,
        # so they cannot be carried across chunks
        raise NotImplementedError(f"Streaming requires norm='CLN', got {norm}")
    if norm in ("BN", "SyncBN"):
        # batch-independent substitute: flax GroupNorm(1) == LayerNorm over C
        return lambda: nn.GroupNorm(num_groups=1, epsilon=1e-5)
    if norm == "IN":
        return lambda: nn.GroupNorm(num_groups=1, epsilon=1e-5)
    raise NotImplementedError(f"Unsupported normalization: {norm}")


class GLFB(nn.Module):
    """Gated local-frequency block (:506-541)."""

    channels: int
    kernel_size: Tuple[int, int] = (3, 3)
    dilation: Tuple[int, int] = (1, 1)
    norm: str = "CLN"
    freq_dim: int = 480
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        beta = self.param("beta", nn.initializers.ones, (c,))
        gamma = self.param("gamma", nn.initializers.ones, (c,))

        h = get_norm(self.norm, self.stream)()(x)
        h = nn.Conv(2 * c, (1, 1), use_bias=False)(h)
        h = CausalConv2d(
            2 * c, self.kernel_size, dilation=self.dilation, groups=2 * c,
            stream=self.stream,
        )(h)
        h = gate(h)
        h = SeChannelModule(c, stream=self.stream)(h)
        h = SeFreqModule(self.freq_dim)(h)
        h = nn.Conv(c, (1, 1), use_bias=False)(h)
        x = x + h * beta

        h = get_norm(self.norm, self.stream)()(x)
        h = nn.Conv(2 * c, (1, 1), use_bias=False)(h)
        h = gate(h)
        h = nn.Conv(c, (1, 1), use_bias=False)(h)
        return x + h * gamma


class DepthConv1d(nn.Module):
    """Causal dilated depthwise TCN block over [B, T, C] (:158-205)."""

    input_channel: int
    hidden_channel: int
    kernel: int = 3
    dilation: int = 1
    skip: bool = True
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray):
        h = nn.Conv(self.hidden_channel, (1,))(x)
        h = nn.PReLU()(h)
        h = CumLN1d(stream=self.stream)(h)
        pad = (self.kernel - 1) * self.dilation
        if self.stream:
            h = _stream_context(self, h, pad)
        else:
            h = jnp.pad(h, ((0, 0), (pad, 0), (0, 0)))
        h = nn.Conv(
            self.hidden_channel, (self.kernel,), kernel_dilation=(self.dilation,),
            feature_group_count=self.hidden_channel, padding="VALID",
        )(h)
        h = nn.PReLU()(h)
        h = CumLN1d(stream=self.stream)(h)
        residual = nn.Conv(self.input_channel, (1,))(h)
        if self.skip:
            return residual, nn.Conv(self.input_channel, (1,))(h)
        return residual, None


class TCN(nn.Module):
    """Causal TCN bottleneck (:209-297)."""

    input_dim: int
    output_dim: int
    bn_dim: int
    hidden_dim: int
    layer: int = 6
    stack: int = 2
    kernel: int = 3
    skip: bool = True
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = CumLN1d(stream=self.stream)(x)
        h = nn.Conv(self.bn_dim, (1,))(h)
        skip_sum = 0.0
        for s in range(self.stack):
            for i in range(self.layer):
                res, skip = DepthConv1d(
                    self.bn_dim, self.hidden_dim, self.kernel, dilation=2 ** i,
                    skip=self.skip, stream=self.stream,
                )(h)
                h = h + res
                if self.skip:
                    skip_sum = skip_sum + skip
        out = skip_sum if self.skip else h
        out = nn.PReLU()(out)
        return nn.Conv(self.output_dim, (1,))(out)


class PixelShuffleBlock(nn.Module):
    """Causal conv + frequency pixel shuffle x2 (:392-437)."""

    out_channels: int
    upscale_factor: int = 2
    kernel_size: Tuple[int, int] = (3, 3)
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        h = CausalConv2d(
            self.out_channels * self.upscale_factor, self.kernel_size,
            use_bias=False, stream=self.stream,
        )(x)
        bt, t, f, c = h.shape
        # channel-major shuffle into frequency (PixelShuffle:396-410)
        h = h.reshape(b, t, f, self.upscale_factor, c // self.upscale_factor)
        h = jnp.swapaxes(h, 2, 3).reshape(b, t, f * self.upscale_factor, c // self.upscale_factor)
        return h


class CSMGAN(nn.Module):
    """Encoder - TCN - decoder over [B, T, F, 2] spectra (:603-688)."""

    in_proj_channels: int = 8
    encoder_channels: Tuple[int, ...] = (8, 8, 16, 16, 24)
    encoder_depths: Tuple[int, ...] = (1, 2, 1, 2)
    encoder_glfb_kernel: Tuple[int, int] = (3, 3)
    tcn_input_dim: int = 720
    tcn_bn_dim: int = 600
    tcn_hidden_dim: int = 600
    tcn_layers: int = 6
    tcn_stacks: int = 2
    tcn_kernel: int = 3
    decoder_depths: Tuple[int, ...] = (1, 2, 1, 2)
    decoder_glfb_kernel: Tuple[int, int] = (3, 3)
    glfb_norm: str = "CLN"
    input_freq: int = 480
    stream: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = CausalConv2d(
            self.in_proj_channels, (3, 3), name="in_proj", stream=self.stream
        )(x)

        skips = []
        for i, depth in enumerate(self.encoder_depths):
            for d in range(depth):
                x = GLFB(
                    channels=self.encoder_channels[i],
                    kernel_size=self.encoder_glfb_kernel,
                    dilation=(2 ** d, 1), norm=self.glfb_norm,
                    freq_dim=self.input_freq // 2 ** i,
                    name=f"enc{i}_glfb{d}", stream=self.stream,
                )(x)
            skips.append(x)
            # freq downsample x2: kernel (1,6) stride (1,2) pad (0,2)
            x = jnp.pad(x, ((0, 0), (0, 0), (2, 2), (0, 0)))
            x = nn.Conv(
                self.encoder_channels[i + 1], (1, 6), strides=(1, 2),
                padding="VALID", use_bias=False, name=f"down{i}",
            )(x)

        b, t, f, c = x.shape
        # torch flattens (C, F) channel-major (forward:679-682): [B,C,F,T] view
        flat = jnp.transpose(x, (0, 3, 2, 1)).reshape(b, c * f, t)
        flat = jnp.swapaxes(flat, 1, 2)  # [B, T, C*F]
        flat = TCN(
            input_dim=self.tcn_input_dim, output_dim=self.tcn_input_dim,
            bn_dim=self.tcn_bn_dim, hidden_dim=self.tcn_hidden_dim,
            layer=self.tcn_layers, stack=self.tcn_stacks, kernel=self.tcn_kernel,
            name="bottleneck", stream=self.stream,
        )(flat)
        x = jnp.swapaxes(flat, 1, 2).reshape(b, c, f, t)
        x = jnp.transpose(x, (0, 3, 2, 1))  # back to [B, T, F, C]

        for i, depth in enumerate(self.decoder_depths):
            out_ch = self.encoder_channels[-i - 2]
            x = PixelShuffleBlock(out_ch, name=f"up{i}", stream=self.stream)(x)
            x = x + skips[-i - 1]
            for d in range(depth):
                x = GLFB(
                    channels=out_ch, kernel_size=self.decoder_glfb_kernel,
                    dilation=(2 ** d, 1), norm=self.glfb_norm,
                    freq_dim=self.input_freq // 2 ** (len(self.encoder_depths) - i - 1),
                    name=f"dec{i}_glfb{d}", stream=self.stream,
                )(x)

        return CausalConv2d(2, (3, 3), name="out_proj", stream=self.stream)(x)


class CSMGANWrapper:
    """Batch-dict wrapper with the STFT front-end (:691-761)."""

    def __init__(
        self,
        n_fft: int = 960,
        win_length: int = 960,
        hop_length: int = 480,
        window: str = "hann",
        sampling_rate: int = 24000,
        compression=None,
        input_freq: int = 480,
        **net_kwargs,
    ):
        from use_tpu.ops.stft_feature import STFTFeature

        self.feature = STFTFeature(
            n_fft=n_fft, win_length=win_length, hop_length=hop_length,
            window=window, sampling_rate=sampling_rate, compression=compression,
            inverse_keys=["fake"],
        )
        # YAML configs deliver sequences as lists; linen attributes must be
        # hashable (the reference tuple-ifies too, generator5_24k.py:721-722)
        net_kwargs = {
            k: tuple(v) if isinstance(v, list) else v
            for k, v in net_kwargs.items()
        }
        self._net_kwargs = dict(input_freq=input_freq, **net_kwargs)
        self.net = CSMGAN(**self._net_kwargs)
        # dummy-wav length for discriminator init when used as the LSGAN G
        # (the reference trains CSMGAN through the same GANModule; crops are
        # the data layer's job — CSMGAN_Wrapper.forward:754-761 has none)
        self.target_len = input_freq * hop_length

    def init_params(self, rng, num_frames: int = 16):
        freq = self.feature.n_fft // 2 + 1
        spec = jnp.zeros((1, num_frames, freq - 1, 2))
        return self.net.init(rng, spec)["params"]

    def enhance_streaming(self, params, wav, chunk_frames: int = 4,
                          session: "CSMGANStream" = None):
        """Enhance [B, L] chunk-by-chunk through a CSMGANStream session.

        Pads L up to a chunk multiple, streams, flushes, trims back to L.
        Returns (enhanced [B, L], session) — pass the session back in for
        subsequent same-shape calls to reuse the compiled step. Reuse is
        gated on OBJECT IDENTITY: the session must have been created by this
        wrapper (same front-end config) and with this exact params pytree
        object — an equal-but-rebuilt params tree recreates (and recompiles)
        the session, by design, since value-comparing a 15M-param pytree per
        call would cost more than the step itself (ADVICE r3)."""
        wav = jnp.asarray(wav)
        b, length = wav.shape
        cs = chunk_frames * self.feature.hop_length
        pad = (-length) % cs
        wav = jnp.pad(wav, ((0, 0), (0, pad)))
        if (session is None or session.batch != b
                or session.k != chunk_frames or session.params is not params
                or getattr(session, "wrapper", None) is not self):
            session = CSMGANStream(
                self, params, batch_size=b, chunk_frames=chunk_frames
            )
        else:
            session.reset()
        pieces = [
            session.step(wav[:, i : i + cs])
            for i in range(0, wav.shape[1], cs)
        ]
        pieces.append(session.flush())
        return jnp.concatenate(pieces, axis=1)[:, :length], session

    def __call__(self, params, batch, rng=None, train=False):
        # rng/train accepted for LSGAN engine-interface parity with
        # NCSNPPWrapper; the forward is deterministic and crop-free
        batch = self.feature(batch)
        spec = batch["perturbed_spectra"]  # [B, F, T, 2]
        x = jnp.transpose(spec, (0, 2, 1, 3))[:, :, :-1, :]  # [B, T, F-1, 2]
        y = self.net.apply({"params": params}, x)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, 1), (0, 0)))
        batch["fake_spectra"] = jnp.transpose(y, (0, 2, 1, 3))
        return self.feature.inverse(batch)


class CSMGANStream:
    """Streaming enhancement session: chunked wav in -> enhanced wav out.

    The reference only notes that CSMGAN is causal by construction
    (generator5_24k.py: causal convs, cumulative norms, causal TCN) and
    benchmarks it offline; this is the actual streaming runtime for it.
    Every causal module carries its left time-context / cumulative statistics
    in a 'stream' variable collection, so chunk-wise outputs are numerically
    IDENTICAL to one offline `CSMGANWrapper.__call__` over the whole
    utterance (tested in tests/test_csmgan.py).

    TPU-first: one fixed-shape jitted step is compiled once and reused for
    the whole session; per-chunk work is a [k, n_fft] DFT matmul, the
    streaming network forward, and an overlap-add with a precomputed
    periodic window envelope — no host-side DSP.

    Framing (center=True STFT, n_fft = 2*hop): `step()` consumes
    chunk_frames*hop samples and emits the same number, delayed by one hop
    (the lookahead of centered frames); the first step emits chunk-hop
    samples and `flush()` emits the final hop, reproducing the offline tail
    (reflect end-padding) for hop-aligned inputs.
    """

    def __init__(self, wrapper: CSMGANWrapper, params, batch_size: int = 1,
                 chunk_frames: int = 4):
        from use_tpu.ops.stft import _dft_matrices, _window_sq

        feat = wrapper.feature
        self.hop = feat.hop_length
        self.n_fft = feat.n_fft
        if feat.cfg.wl != self.n_fft or self.n_fft != 2 * self.hop:
            raise NotImplementedError(
                "CSMGANStream requires win_length == n_fft == 2*hop "
                f"(got n_fft={self.n_fft}, win={feat.cfg.wl}, hop={self.hop})"
            )
        if chunk_frames < 2:
            raise ValueError("chunk_frames must be >= 2 (reflect priming)")
        self.k = chunk_frames
        self.chunk_samples = chunk_frames * self.hop
        self.batch = batch_size
        self.compression = feat.compression
        self.freqs = self.n_fft // 2 + 1
        self.params = params
        self.wrapper = wrapper  # reuse gate in enhance_streaming (ADVICE r3)

        self._net = CSMGAN(stream=True, **wrapper._net_kwargs)
        dummy = jnp.zeros((batch_size, chunk_frames, self.freqs - 1, 2))
        # init RUNS the forward, so the returned collection is the state
        # AFTER the dummy chunk — a fresh stream starts from all-zeros
        net_state0 = jax.tree.map(
            jnp.zeros_like,
            self._net.init({"params": jax.random.PRNGKey(0)}, dummy)["stream"],
        )

        fwd, inv = _dft_matrices(self.n_fft, self.n_fft, feat.window)
        self._fwd = jnp.asarray(fwd)
        self._inv = jnp.asarray(inv)
        wsq = _window_sq(self.n_fft, self.n_fft, feat.window)
        env = wsq[: self.hop] + wsq[self.hop :]
        self._env = jnp.asarray(np.where(env > 1e-11, env, 1.0))

        self.state = {
            "net": net_state0,
            # last hop+1 raw input samples (the +1 feeds flush's reflection)
            "wav_ctx": jnp.zeros((batch_size, self.hop + 1)),
            # pending (un-normalized) overlap-add tail
            "ola": jnp.zeros((batch_size, self.hop)),
        }
        self._started = False
        self._flushed = False
        self._state0 = jax.tree.map(jnp.zeros_like, self.state)
        self._step = jax.jit(self._make_step(chunk_frames))
        self._flush_step = jax.jit(self._make_step(1, update_wav_ctx=False))

    def reset(self) -> None:
        """Zero all carried state to start a new stream (keeps the
        compiled step)."""
        self.state = self._state0
        self._started = False
        self._flushed = False

    # -- core jitted chunk program -----------------------------------------
    def _make_step(self, k: int, update_wav_ctx: bool = True):
        from use_tpu.ops.stft_feature import (
            _compress, _decompress, mag_unit_phase,
        )

        hop, n_fft, f = self.hop, self.n_fft, self.freqs

        def step(params, state, sig_new):
            # sig = padded-signal window [B, (k+1)*hop]: one hop of carried
            # context + k new hops
            sig = jnp.concatenate([state["wav_ctx"][:, 1:], sig_new], axis=1)
            idx = (
                np.arange(k, dtype=np.int32)[:, None] * hop
                + np.arange(n_fft, dtype=np.int32)[None, :]
            )
            frames = sig[:, idx]  # [B, k, n_fft]
            spec = jnp.matmul(
                frames, self._fwd, precision=jax.lax.Precision.HIGHEST
            )  # [B, k, 2F]
            spec = jnp.stack([spec[..., :f], spec[..., f:]], axis=-1)
            if self.compression is not None:
                mag, unit = mag_unit_phase(spec)
                spec = _compress(mag, self.compression)[..., None] * unit

            y, mut = self._net.apply(
                {"params": params, "stream": state["net"]},
                spec[:, :, : f - 1, :], mutable=["stream"],
            )
            y = jnp.pad(y, ((0, 0), (0, 0), (0, 1), (0, 0)))

            if self.compression is not None:
                mag, unit = mag_unit_phase(y)
                y = _decompress(mag, self.compression)[..., None] * unit
            sp = jnp.concatenate([y[..., 0], y[..., 1]], axis=-1)  # [B,k,2F]
            out_frames = jnp.matmul(
                sp, self._inv, precision=jax.lax.Precision.HIGHEST
            )  # [B, k, n_fft]

            acc = jnp.zeros((sig.shape[0], (k + 1) * hop), out_frames.dtype)
            acc = acc.at[:, :hop].add(state["ola"])
            acc = acc.at[:, idx.reshape(-1)].add(
                out_frames.reshape(out_frames.shape[0], -1)
            )
            emit = acc[:, : k * hop] / jnp.tile(self._env, k)

            new_state = {
                "net": mut["stream"],
                "wav_ctx": sig[:, -hop - 1 :] if update_wav_ctx
                else state["wav_ctx"],
                "ola": acc[:, k * hop :],
            }
            return new_state, emit

        return step

    # -- public API --------------------------------------------------------
    def step(self, chunk) -> jnp.ndarray:
        """Feed [B, chunk_frames*hop] samples; emit the ready samples.

        Returns chunk-hop samples on the first call (framing lookahead),
        a full chunk afterwards."""
        if self._flushed:
            raise RuntimeError("stream already flushed; start a new session")
        chunk = jnp.asarray(chunk)
        assert chunk.shape == (self.batch, self.chunk_samples), chunk.shape
        if not self._started:
            # center=True reflect pre-pad: pad[i] = x[hop - i]
            prime = chunk[:, 1 : self.hop + 1][:, ::-1]
            self.state = {
                **self.state,
                "wav_ctx": jnp.concatenate(
                    [jnp.zeros((self.batch, 1)), prime], axis=1
                ),
            }
            self.state, emit = self._step(self.params, self.state, chunk)
            self._started = True
            return emit[:, self.hop :]
        self.state, emit = self._step(self.params, self.state, chunk)
        return emit

    def flush(self) -> jnp.ndarray:
        """End of stream: emit the final hop of samples (offline-tail parity).

        Synthesizes the last centered frame from the carried context and its
        reflection (torch.stft's end padding), matching the offline
        wrapper's output length for hop-aligned inputs."""
        if self._flushed:
            raise RuntimeError("stream already flushed; start a new session")
        if not self._started:
            raise RuntimeError("flush() before any step()")
        self._flushed = True
        ctx = self.state["wav_ctx"]
        endpad = ctx[:, : self.hop][:, ::-1]  # x[L-2-i], i=0..hop-1
        state, emit = self._flush_step(self.params, self.state, endpad)
        self.state = state
        return emit


GeneratorRegistry.register("csmgan")(CSMGANWrapper)
