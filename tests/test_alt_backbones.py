"""Alternative backbones / generators: GaGNet, ConvTasNet, HiFi-GAN+ BWE,
spec discriminators — shapes and finiteness on tiny configs."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from use_tpu.models import BackboneRegistry  # registers gagnet/convtasnet
from use_tpu.models.gan.hifigan_bwe import BandwidthExtender
from use_tpu.models.gan.spec_discriminator import MultiSpecDiscriminator


def test_gagnet_tiny():
    net = BackboneRegistry.get_by_name("gagnet")(
        c=8, cd1=8, d_feat=32, p=1, q=2, dilas=(1, 2), fft_num=64, is_u2=False,
    )
    # fft_num=64 -> F=33 odd; encoder halves 5x: 33->15->7->3->1->... needs F big enough
    x = jnp.zeros((1, 33, 12, 2))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 33, 12, 1, 2)
    assert np.isfinite(np.asarray(out)).all()


def test_gagnet_is_masking():
    """Zero input spectrum -> zero output (pure complex mask)."""
    net = BackboneRegistry.get_by_name("gagnet")(
        c=8, cd1=8, d_feat=32, p=1, q=1, dilas=(1,), fft_num=64, is_u2=False,
    )
    x = jnp.zeros((1, 33, 8, 2))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-7)


def test_convtasnet_tiny():
    net = BackboneRegistry.get_by_name("convtasnet")(
        fs=8000, enc_dim=16, feature_dim=8, layer=3, stack=1,
    )
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 1600)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_convtasnet_causal_variant():
    net = BackboneRegistry.get_by_name("convtasnet")(
        fs=8000, enc_dim=8, feature_dim=8, layer=2, stack=1, causal=True,
    )
    x = jnp.zeros((1, 800))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    assert net.apply({"params": params}, x).shape == x.shape


@pytest.mark.slow
def test_bwe_upsamples():
    net = BandwidthExtender()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 800)), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x, 8000)["params"]
    out = net.apply({"params": params}, x, 8000)
    assert out.shape == (1, 2400)  # 8k -> 24k
    assert np.abs(np.asarray(out)).max() <= 1.0  # tanh output


def test_multi_spec_discriminator():
    d = MultiSpecDiscriminator(fft_sizes=(256, 512), hop_sizes=(64, 128),
                               win_lengths=(192, 384), channels=8)
    x = jnp.zeros((1, 4000))
    params = d.init(jax.random.PRNGKey(0), x)["params"]
    logits, fmaps = d.apply({"params": params}, x)
    assert len(logits) == 2 and len(fmaps) == 2
    assert all(len(f) == 6 for f in fmaps)


def test_hifigan_vocoder_generator():
    from use_tpu.models.gan.hifigan_vocoder import HifiganGenerator

    g = HifiganGenerator(
        channels=32, upsample_scales=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),), in_channels=16,
    )
    x = jnp.zeros((1, 20, 16))
    p = g.init(jax.random.PRNGKey(0), x)["params"]
    y = g.apply({"params": p}, x)
    assert y.shape == (1, 320)  # T * prod(scales)
    assert np.abs(np.asarray(y)).max() <= 1.0  # tanh


def test_hifigan_vocoder_nsf():
    from use_tpu.models.gan.hifigan_vocoder import HifiganGenerator

    g = HifiganGenerator(
        channels=32, upsample_scales=(4, 4), upsample_kernel_sizes=(8, 8),
        resblock_kernel_sizes=(3,), resblock_dilations=((1, 3),), in_channels=18,
        nsf_params=dict(nb_harmonics=4, sampling_rate=24000),
    )
    x = jnp.concatenate(
        [jnp.zeros((1, 20, 16)), jnp.full((1, 20, 1), 200.0), jnp.ones((1, 20, 1))], -1
    )
    p = g.init({"params": jax.random.PRNGKey(0), "source": jax.random.PRNGKey(1)}, x)["params"]
    y = g.apply({"params": p}, x, rngs={"source": jax.random.PRNGKey(2)})
    assert y.shape == (1, 320)
    assert np.isfinite(np.asarray(y)).all()
