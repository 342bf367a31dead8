"""Golden parity vs reference torch modules: discriminators + alt backbones.

Random torch weights (weight-normed) are folded + converted and both stacks
run on the same waveform — validates the period folding, conv arithmetic,
reflect padding and the weight-norm fold in one shot. The multi-rate wave
and mel banks depend on torchaudio (not in this image), so their parity is
covered structurally (tests/test_gan.py) rather than numerically.
"""
import numpy as np
import torch

import jax
import jax.numpy as jnp

from tests.reference_harness import import_reference
from use_tpu.engine.convert_torch import (
    convert_multi_period_discriminator_state_dict,
    convert_multi_spec_discriminator_state_dict,
)
from use_tpu.models.gan.discriminators import MultiPeriodDiscriminator
from use_tpu.models.gan.spec_discriminator import MultiSpecDiscriminator

import_reference()
from src.models.components.GAN.discriminator.hifigan_vocoder.hifigan import (  # noqa: E402
    MultiPeriodDiscriminator as TorchMPD,
    MultiSpecDiscriminator as TorchMSpecD,
)


def test_mpd_parity():
    torch.manual_seed(0)
    tnet = TorchMPD()
    tnet.eval()

    rng = np.random.default_rng(0)
    wav = (0.3 * rng.standard_normal((2, 7680))).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_fmaps = tnet(torch.from_numpy(wav)[:, None, :])
    params = convert_multi_period_discriminator_state_dict(tnet.state_dict())

    jnet = MultiPeriodDiscriminator()
    with jax.default_matmul_precision("highest"):
        logits, fmaps = jnet.apply({"params": params}, jnp.asarray(wav))

    assert len(logits) == len(ref_logits) == 5
    for i, (ref_lg, ref_fm, lg, fm) in enumerate(
        zip(ref_logits, ref_fmaps, logits, fmaps)
    ):
        np.testing.assert_allclose(
            np.asarray(lg), ref_lg.numpy(), atol=2e-4, rtol=2e-3,
            err_msg=f"period disc {i} logits",
        )
        assert len(fm) == len(ref_fm)
        # feature maps: torch NCHW [B, C, T/p, p] vs ours [B, T/p, p, C]
        for j, (rf, of) in enumerate(zip(ref_fm, fm)):
            np.testing.assert_allclose(
                np.transpose(np.asarray(of), (0, 3, 1, 2)), rf.numpy(),
                atol=2e-4, rtol=2e-3, err_msg=f"disc {i} fmap {j}",
            )


def test_multi_spec_discriminator_parity():
    """MultiSpecDiscriminator: torch.stft magnitude front-end + the
    reference's int-padding quirk (the W axis of the [T, 1] map grows)."""
    torch.manual_seed(1)
    # The reference's default discriminator_params carry a typo
    # ('kernel_sizes' — SpecDiscriminator takes 'kernel_size'), so its own
    # defaults raise TypeError (hifigan.py:583-601). Pass corrected params.
    tnet = TorchMSpecD(
        discriminator_params={"channels": 15, "init_kernel": 1,
                              "kernel_size": 11, "stride": 2}
    )
    tnet.eval()

    rng = np.random.default_rng(1)
    wav = (0.3 * rng.standard_normal((2, 7680))).astype(np.float32)
    with torch.no_grad():
        ref_logits, ref_fmaps = tnet(torch.from_numpy(wav)[:, None, :])

    params = convert_multi_spec_discriminator_state_dict(tnet.state_dict())
    jnet = MultiSpecDiscriminator()
    with jax.default_matmul_precision("highest"):
        logits, fmaps = jnet.apply({"params": params}, jnp.asarray(wav))

    assert len(logits) == len(ref_logits) == 3
    for i, (ref_lg, lg) in enumerate(zip(ref_logits, logits)):
        ref = ref_lg.numpy()
        got = np.asarray(lg)
        # ours: [B, T', W']; ref: [B, T', W'] after squeeze(-1)? match shapes
        np.testing.assert_allclose(
            got.reshape(ref.shape), ref, atol=2e-3, rtol=2e-2,
            err_msg=f"spec disc {i} logits",
        )


def test_convtasnet_parity():
    """Golden parity of the ConvTasNet alt backbone (time-domain
    encoder/TCN-mask/decoder) against the reference torch implementation
    with converted weights — covers the encoder/decoder overlap-add
    arithmetic, gLN, PReLUs and the dilated depthwise TCN."""
    from src.models.components.sgmse.backbones.convtasnet import (
        ConvTasNet as TorchCTN,
    )

    from use_tpu.engine.convert_torch import convert_convtasnet_state_dict
    from use_tpu.models.convtasnet import ConvTasNet

    torch.manual_seed(0)
    kw = dict(enc_dim=32, feature_dim=16, layer=3, stack=2, kernel=3,
              causal=False, fs=16000, win=2)
    tnet = TorchCTN(**kw)
    tnet.eval()

    rng = np.random.default_rng(0)
    wav = (0.3 * rng.standard_normal((2, 4000))).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(wav)).numpy()
    # the reference returns the padded length; trim like a consumer would
    stride = tnet.stride
    ref = ref[:, stride : stride + wav.shape[1]]

    params = convert_convtasnet_state_dict(
        tnet.state_dict(), layer=kw["layer"], stack=kw["stack"]
    )
    jnet = ConvTasNet(enc_dim=32, feature_dim=16, layer=3, stack=2,
                      kernel=3, causal=False, fs=16000, win_ms=2.0)
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jnet.apply({"params": params}, jnp.asarray(wav)))

    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_csmgan_parity():
    """Golden parity of the CSMGAN causal generator core vs the reference
    torch implementation with converted weights — covers the GLFB gated
    blocks (CumLN2d, channel/freq SE attention, gates), the causal TCN
    bottleneck over the flattened (C, F) axis, the frequency PixelShuffle
    decoder (channel-order transform) and the down/up projections."""
    from src.models.components.GAN.generator.CSMGAN.generator5_24k import (
        CSMGAN as TorchCSMGAN,
    )

    from use_tpu.engine.convert_torch import convert_csmgan_state_dict
    from use_tpu.models.gan.csmgan import CSMGAN

    torch.manual_seed(0)
    kw = dict(
        in_proj_channels=2, encoder_channels=[2, 2, 4], encoder_depths=[1, 2],
        encoder_GLFB_kernel_size=(3, 3), TCN_input_dim=16, TCN_BN_dim=8,
        TCN_hidden_dim=8, TCN_layers=2, TCN_stacks=1, TCN_kernel_size=3,
        decoder_depths=[1, 2], decoder_GLFB_kernel_size=(3, 3),
        GLFB_norm="CLN", input_freq=16,
    )
    tnet = TorchCSMGAN(**kw)
    tnet.eval()

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 2, 8, 16)).astype(np.float32)  # B, 2, T, F
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x)).numpy()

    params = convert_csmgan_state_dict(tnet.state_dict())
    jnet = CSMGAN(
        in_proj_channels=2, encoder_channels=(2, 2, 4), encoder_depths=(1, 2),
        tcn_input_dim=16, tcn_bn_dim=8, tcn_hidden_dim=8, tcn_layers=2,
        tcn_stacks=1, decoder_depths=(1, 2), input_freq=16,
    )
    x_jax = np.transpose(x, (0, 2, 3, 1))  # [B, T, F, 2]
    with jax.default_matmul_precision("highest"):
        got = np.asarray(jnet.apply({"params": params}, jnp.asarray(x_jax)))
    got = np.transpose(got, (0, 3, 1, 2))

    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)
