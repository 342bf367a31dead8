"""NCSN++ score U-Net in Flax (NHWC), with the reference's exact topology.

Behavior re-implemented from reference src/models/components/sgmse/backbones/
ncsnpp.py:38-559: progressive input_skip/output_skip pyramids, BigGAN
residual blocks with FIR resampling, a single bottleneck attention block,
Gaussian-Fourier log-t embedding, optional 1/sigma output scaling, and the
`discriminative` mode (no conditioning, 2 input channels) used by the LSGAN
generator.

Complex spectrograms are carried as trailing real-pair channels: the module
consumes ``[B, F, T, C_total]`` real channels (per complex input: re, im —
matching the reference's channel-split order, ncsnpp.py:332-347) and returns
``[B, F, T, spatial_channels, 2]``.

Submodules are named ``m{i}`` in the order the reference's forward pass walks
its flat ``all_modules`` list (ncsnpp.py:329-491), so a converted torch
checkpoint maps ``all_modules.{i}.X -> params['m{i}']['X']`` mechanically.
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from use_tpu.models.ncsnpp import layers
from use_tpu.models.registry import BackboneRegistry
from use_tpu.ops.upfirdn2d import downsample_2d, upsample_2d


@dataclass(frozen=True)
class NCSNppConfig:
    """Static architecture config (defaults = reference ncsnpp.py:42-68)."""

    scale_by_sigma: bool = True
    nonlinearity: str = "swish"
    nf: int = 128
    ch_mult: Tuple[int, ...] = (1, 2, 2, 2)
    num_res_blocks: int = 1
    attn_resolutions: Tuple[int, ...] = (0,)
    resamp_with_conv: bool = True
    conditional: bool = True
    fir: bool = True
    fir_kernel: Tuple[float, ...] = (1.0, 3.0, 3.0, 1.0)
    skip_rescale: bool = True
    resblock_type: str = "biggan"
    progressive: str = "output_skip"
    progressive_input: str = "input_skip"
    progressive_combine: str = "sum"
    init_scale: float = 0.0
    fourier_scale: float = 16.0
    image_size: int = 256
    embedding_type: str = "fourier"
    input_channels: int = 4
    spatial_channels: int = 1
    dropout: float = 0.0
    centered: bool = False
    discriminative: bool = False
    dtype: str = "float32"  # compute dtype for convs/matmuls ('bfloat16' for
    # inference/serving speed; params and normalizations stay float32)
    quant: str = "none"  # 'int8': residual-block convs run the MXU in int8
    # via lax.conv with fused-quantize producers; 'int8_pallas': the Pallas
    # kernel fuses GN-apply+SiLU+quantize into the conv operand read
    # (ops/pallas_qconv.py) — serving-only, SiLU backbones
    # with dynamic per-sample/per-channel scales (use_tpu/ops/qconv.py);
    # inference-only serving mode, ~2x MXU rate on v5e
    quant_min_channels: int = 128  # gate: only convs with
    # min(Cin, Cout) >= this quantize (see ops/qconv.py::QConv)
    quant_k: float = 6.0  # k-sigma analytic activation range (GroupNormAct)
    remat: bool = False  # rematerialize residual blocks in the backward
    # pass (jax.checkpoint per block). Required to FIT the shipping
    # ncsnpplarge training step (512x512 specs, batch 2 x accum 4) in one
    # v5e's 16 GB HBM — without it the f32 backward OOMs; costs one extra
    # forward worth of FLOPs during training, nothing at inference.
    remat_policy: str = "full"  # 'full': save only block inputs, recompute
    # everything; 'conv_outs': additionally save the tagged convolution
    # outputs (jax.checkpoint_policies.save_only_these_names) so the
    # backward recomputes only the cheap GN/act/FIR passes, not the convs.

    def resolve(self) -> "NCSNppConfig":
        """Apply the discriminative-mode overrides (ncsnpp.py:86-92)."""
        if self.discriminative:
            return dataclasses_replace(
                self, conditional=False, scale_by_sigma=False, input_channels=2
            )
        return self


def dataclasses_replace(cfg, **kw):
    import dataclasses

    return dataclasses.replace(cfg, **kw)


class NCSNpp(nn.Module):
    """NCSN++ U-Net. Input [B, F, T, C_total]; output [B, F, T, D, 2]."""

    cfg: NCSNppConfig = NCSNppConfig()

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, time_cond: Optional[jnp.ndarray] = None, *, train: bool = False
    ) -> jnp.ndarray:
        cfg = self.cfg.resolve()
        act = layers.get_act(cfg.nonlinearity)
        nf = cfg.nf
        num_resolutions = len(cfg.ch_mult)
        all_resolutions = [cfg.image_size // (2 ** i) for i in range(num_resolutions)]
        total_channels = cfg.input_channels * cfg.spatial_channels
        assert cfg.embedding_type == "fourier", "only fourier embedding supported"
        assert cfg.resblock_type in ("ddpm", "biggan")
        assert cfg.progressive in ("none", "output_skip", "residual")
        assert cfg.progressive_input in ("none", "input_skip", "residual")
        combine_method = cfg.progressive_combine.lower()
        cdtype = jnp.bfloat16 if cfg.dtype == "bfloat16" else jnp.float32

        assert x.shape[-1] == total_channels, (x.shape, total_channels)

        # --- module walk bookkeeping (matches reference forward, ncsnpp.py:329+)
        midx = iter(range(10_000))

        def mname() -> str:
            return f"m{next(midx)}"

        resblock_cls = (
            layers.ResnetBlockBigGANpp
            if cfg.resblock_type == "biggan"
            else layers.ResnetBlockDDPMpp
        )
        if cfg.remat:
            # per-block rematerialization; (self, x, temb, train) -> train
            # is static (Python bool controlling dropout determinism). Note
            # the gate must NOT depend on `train`: the score-matching loss
            # applies the backbone with train=False (dropout 0 in the
            # shipping recipes) and still differentiates through it. In
            # forward-only (sampler) traces the checkpoint wrapper is a
            # plain call that XLA inlines — no fusion impact.
            import jax

            policy = (
                jax.checkpoint_policies.save_only_these_names("ncsnpp_conv_out")
                if cfg.remat_policy == "conv_outs"
                else None
            )
            resblock_cls = nn.remat(
                resblock_cls, static_argnums=(3,), policy=policy
            )
        if cfg.resblock_type == "biggan":
            ResnetBlock = functools.partial(
                resblock_cls,
                act=act, dropout=cfg.dropout, fir=cfg.fir, fir_kernel=cfg.fir_kernel,
                init_scale=cfg.init_scale, skip_rescale=cfg.skip_rescale,
                temb_dim=nf * 4, dtype=cdtype, quant=cfg.quant,
                quant_min_channels=cfg.quant_min_channels,
                quant_k=cfg.quant_k,
            )
        else:
            ResnetBlock = functools.partial(
                resblock_cls,
                act=act, dropout=cfg.dropout, init_scale=cfg.init_scale,
                skip_rescale=cfg.skip_rescale, temb_dim=nf * 4, dtype=cdtype,
                quant=cfg.quant, quant_min_channels=cfg.quant_min_channels,
                quant_k=cfg.quant_k,
            )
        AttnBlock = functools.partial(
            layers.AttnBlockpp, init_scale=cfg.init_scale,
            skip_rescale=cfg.skip_rescale, dtype=cdtype,
        )

        # --- time embedding (GFP of log t; ncsnpp.py:349-368)
        temb = None
        gfp = layers.GaussianFourierProjection(
            embedding_size=nf, scale=cfg.fourier_scale, name=mname()
        )
        if time_cond is not None:
            used_sigmas = time_cond
            temb = gfp(jnp.log(used_sigmas))
        if cfg.conditional:
            temb = nn.Dense(
                nf * 4, kernel_init=layers.default_init(),
                bias_init=nn.initializers.zeros, name=mname(),
            )(temb)
            temb = nn.Dense(
                nf * 4, kernel_init=layers.default_init(),
                bias_init=nn.initializers.zeros, name=mname(),
            )(act(temb))
        else:
            temb = None

        if not cfg.centered:
            x = 2 * x - 1.0  # ncsnpp.py:372-374 (applied to spec channels)
        x = x.astype(cdtype)

        # --- downsampling path
        input_pyramid = None
        if cfg.progressive_input != "none":
            input_pyramid = x

        hs = [layers.conv3x3(nf, name=mname(), dtype=cdtype)(x)]
        for i_level in range(num_resolutions):
            for _ in range(cfg.num_res_blocks):
                out_ch = nf * cfg.ch_mult[i_level]
                h = ResnetBlock(out_ch=out_ch, name=mname())(hs[-1], temb, train)
                if all_resolutions[i_level] in cfg.attn_resolutions:
                    h = AttnBlock(name=mname())(h)
                hs.append(h)

            if i_level != num_resolutions - 1:
                if cfg.resblock_type == "ddpm":
                    h = layers.Downsample(
                        with_conv=cfg.resamp_with_conv, fir=cfg.fir,
                        fir_kernel=cfg.fir_kernel, name=mname(),
                    )(hs[-1])
                else:
                    h = ResnetBlock(down=True, name=mname())(hs[-1], temb, train)

                if cfg.progressive_input == "input_skip":
                    input_pyramid = downsample_2d(input_pyramid, cfg.fir_kernel, factor=2)
                    h = layers.Combine(
                        dim2=h.shape[-1], method=combine_method, name=mname(),
                        dtype=cdtype,
                    )(input_pyramid, h)
                elif cfg.progressive_input == "residual":
                    input_pyramid = layers.Downsample(
                        with_conv=True, fir=cfg.fir, fir_kernel=cfg.fir_kernel,
                        out_ch=h.shape[-1], name=mname(),
                    )(input_pyramid)
                    if cfg.skip_rescale:
                        input_pyramid = (input_pyramid + h) * float(1.0 / np.sqrt(2.0))
                    else:
                        input_pyramid = input_pyramid + h
                    h = input_pyramid
                hs.append(h)

        # --- bottleneck: Resnet -> Attn -> Resnet (ncsnpp.py:244-246, 419-425)
        h = hs[-1]
        h = ResnetBlock(name=mname())(h, temb, train)
        h = AttnBlock(name=mname())(h)
        h = ResnetBlock(name=mname())(h, temb, train)

        pyramid = None

        # --- upsampling path
        for i_level in reversed(range(num_resolutions)):
            for _ in range(cfg.num_res_blocks + 1):
                out_ch = nf * cfg.ch_mult[i_level]
                h = ResnetBlock(out_ch=out_ch, name=mname())(
                    jnp.concatenate([h, hs.pop()], axis=-1), temb, train
                )

            if all_resolutions[i_level] in cfg.attn_resolutions:
                h = AttnBlock(name=mname())(h)

            if cfg.progressive != "none":
                if i_level == num_resolutions - 1:
                    if cfg.progressive == "output_skip":
                        pyramid = layers.GroupNormAct(
                            h.shape[-1], act=act, out_dtype=cdtype, name=mname()
                        )(h)
                        pyramid = layers.conv3x3(
                            total_channels, init_scale=cfg.init_scale, name=mname(),
                            dtype=cdtype,
                        )(pyramid)
                    else:  # residual
                        pyramid = layers.GroupNormAct(
                            h.shape[-1], act=act, out_dtype=cdtype, name=mname()
                        )(h)
                        pyramid = layers.conv3x3(h.shape[-1], name=mname(), dtype=cdtype)(pyramid)
                else:
                    if cfg.progressive == "output_skip":
                        pyramid = upsample_2d(pyramid, cfg.fir_kernel, factor=2)
                        pyramid_h = layers.GroupNormAct(
                            h.shape[-1], act=act, out_dtype=cdtype, name=mname()
                        )(h)
                        pyramid_h = layers.conv3x3(
                            total_channels, init_scale=cfg.init_scale, name=mname(),
                            dtype=cdtype,
                        )(pyramid_h)
                        pyramid = pyramid + pyramid_h
                    else:  # residual
                        pyramid = layers.Upsample(
                            with_conv=True, fir=cfg.fir, fir_kernel=cfg.fir_kernel,
                            out_ch=h.shape[-1], name=mname(),
                        )(pyramid)
                        if cfg.skip_rescale:
                            pyramid = (pyramid + h) * float(1.0 / np.sqrt(2.0))
                        else:
                            pyramid = pyramid + h
                        h = pyramid

            if i_level != 0:
                if cfg.resblock_type == "ddpm":
                    h = layers.Upsample(
                        with_conv=cfg.resamp_with_conv, fir=cfg.fir,
                        fir_kernel=cfg.fir_kernel, name=mname(),
                    )(h)
                else:
                    h = ResnetBlock(up=True, name=mname())(h, temb, train)

        assert not hs

        if cfg.progressive == "output_skip":
            h = pyramid
        else:
            h = layers.GroupNormAct(
                h.shape[-1], act=act, out_dtype=jnp.float32, name=mname()
            )(h)
            h = layers.conv3x3(total_channels, init_scale=cfg.init_scale, name=mname())(h)

        if cfg.scale_by_sigma:
            assert time_cond is not None
            # reciprocal in fp32, applied in the compute dtype: keeps the
            # full-resolution tail (sigma scale + output projection) in bf16
            # on the serving path — the old astype(f32)-then-divide chain
            # materialized an f32 copy of the full-res activation (~11 ms of
            # a 378 ms sampler step measured on v5e)
            inv = (1.0 / used_sigmas).reshape((-1,) + (1,) * (h.ndim - 1))
            h = h * inv.astype(h.dtype)

        # output projection to complex pairs (ncsnpp.py:114, 497-500):
        # channels [2*D] split re-major: out[..., :D]=re, out[..., D:]=im
        h = layers.conv1x1(
            2 * cfg.spatial_channels, name="output_layer", dtype=cdtype,
        )(h).astype(jnp.float32)
        d = cfg.spatial_channels
        h = jnp.stack([h[..., :d], h[..., d:]], axis=-1)  # [B, F, T, D, 2]
        return h


def _variant(name: str, **overrides):
    @BackboneRegistry.register(name)
    def make(**kwargs) -> NCSNpp:
        merged = {**overrides, **kwargs}
        return NCSNpp(cfg=NCSNppConfig(**merged))

    make.__name__ = f"make_{name}"
    return make


# Registered variants (reference ncsnpp.py:38, 504-559)
make_ncsnpp = _variant("ncsnpp")
make_ncsnpp_large = _variant(
    "ncsnpplarge", nf=128, ch_mult=(1, 1, 2, 2, 2, 2, 2), num_res_blocks=2,
    attn_resolutions=(0,),
)
make_ncsnpp_12m = _variant(
    "ncsnpp12M", nf=96, ch_mult=(1, 2, 2, 1), num_res_blocks=1, attn_resolutions=(0,),
)
make_ncsnpp_6m = _variant(
    "ncsnpp6M", nf=96, ch_mult=(1, 1, 1, 1), num_res_blocks=1, attn_resolutions=(0,),
)
