"""CSMGAN: shapes, causality, parameter count vs the reference self-test."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from use_tpu.models.gan.csmgan import CSMGAN, CSMGANWrapper, CumLN1d, CausalConv2d


def test_cumln_causal():
    """Cumulative layer norm at step t must not depend on steps > t."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 10, 4)), jnp.float32)
    m = CumLN1d()
    p = m.init(jax.random.PRNGKey(0), x)
    full = m.apply(p, x)
    half = m.apply(p, x[:, :5])
    np.testing.assert_allclose(np.asarray(full)[:, :5], np.asarray(half), atol=1e-6)


def test_causal_conv_is_causal():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 12, 8, 2)), jnp.float32)
    m = CausalConv2d(4, (3, 3))
    p = m.init(jax.random.PRNGKey(0), x)
    full = np.asarray(m.apply(p, x))
    # perturb the future
    x2 = x.at[:, 8:].set(0.0)
    part = np.asarray(m.apply(p, x2))
    np.testing.assert_allclose(full[:, :8], part[:, :8], atol=1e-6)


@pytest.mark.slow
def test_csmgan_shapes_and_params():
    """Default config: ~ the reference's param count (self-test :764-788)."""
    net = CSMGAN()
    x = jnp.zeros((1, 20, 480, 2))
    params = net.init(jax.random.PRNGKey(0), x)["params"]
    out = net.apply({"params": params}, x)
    assert out.shape == (1, 20, 480, 2)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    # reference CSMGAN_Wrapper default config has exactly 14,865,275 params
    # (generator5_24k.py:764-788 self-test); match it.
    assert n == 14_865_275, n


def test_csmgan_tiny_end_to_end():
    # n_fft=96 -> F=49, and the net consumes F-1=48=input_freq bins
    wrapper = CSMGANWrapper(
        n_fft=96, win_length=96, hop_length=48, input_freq=48,
        encoder_channels=(4, 4, 8), encoder_depths=(1, 1),
        decoder_depths=(1, 1), tcn_input_dim=96, tcn_bn_dim=32,
        tcn_hidden_dim=32, tcn_layers=2, tcn_stacks=1,
        in_proj_channels=4,
    )
    params = wrapper.init_params(jax.random.PRNGKey(0))
    wav = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 2400)).astype(np.float32)
    )
    out = wrapper(params, {"perturbed": wav})
    assert out["fake"].shape == wav.shape
    assert np.isfinite(np.asarray(out["fake"])).all()


def test_csmgan_streaming_matches_offline():
    """Chunked streaming (state-carry) == one offline pass, sample-exact.

    Covers every carried state: causal-conv left contexts, cumulative-norm
    statistics, TCN dilation buffers, STFT framing context and the
    overlap-add tail, plus flush()'s reproduction of the offline reflect
    end-padding."""
    from use_tpu.models.gan.csmgan import CSMGANStream

    wrapper = CSMGANWrapper(
        n_fft=96, win_length=96, hop_length=48, input_freq=48,
        encoder_channels=(4, 4, 8), encoder_depths=(1, 1),
        decoder_depths=(1, 1), tcn_input_dim=96, tcn_bn_dim=32,
        tcn_hidden_dim=32, tcn_layers=2, tcn_stacks=1,
        in_proj_channels=4,
    )
    params = wrapper.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    n_chunks, k, hop = 4, 3, 48
    wav = jnp.asarray(
        rng.standard_normal((2, n_chunks * k * hop)).astype(np.float32)
    )

    offline = np.asarray(wrapper(params, {"perturbed": wav})["fake"])

    sess = CSMGANStream(wrapper, params, batch_size=2, chunk_frames=k)
    pieces = [
        np.asarray(sess.step(wav[:, i * k * hop : (i + 1) * k * hop]))
        for i in range(n_chunks)
    ]
    pieces.append(np.asarray(sess.flush()))
    stream = np.concatenate(pieces, axis=1)

    assert stream.shape == offline.shape, (stream.shape, offline.shape)
    np.testing.assert_allclose(stream, offline, atol=2e-4, rtol=1e-4)


def test_enhance_streaming_pads_and_reuses_session():
    """enhance_streaming == offline on the chunk-padded wav, trimmed; a
    reused (reset) session gives identical output."""
    wrapper = CSMGANWrapper(
        n_fft=96, win_length=96, hop_length=48, input_freq=48,
        encoder_channels=(4, 4, 8), encoder_depths=(1, 1),
        decoder_depths=(1, 1), tcn_input_dim=96, tcn_bn_dim=32,
        tcn_hidden_dim=32, tcn_layers=2, tcn_stacks=1,
        in_proj_channels=4,
    )
    params = wrapper.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    k, hop = 2, 48
    length = 5 * hop + 17  # NOT chunk- or hop-aligned
    wav = jnp.asarray(rng.standard_normal((1, length)).astype(np.float32))

    cs = k * hop
    pad = (-length) % cs
    padded = jnp.pad(wav, ((0, 0), (0, pad)))
    offline = np.asarray(wrapper(params, {"perturbed": padded})["fake"])[:, :length]

    out1, sess = wrapper.enhance_streaming(params, wav, chunk_frames=k)
    np.testing.assert_allclose(np.asarray(out1), offline, atol=2e-4, rtol=1e-4)

    out2, sess2 = wrapper.enhance_streaming(
        params, wav, chunk_frames=k, session=sess
    )
    assert sess2 is sess  # compiled step reused
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out1), atol=0)


def test_csmgan_streaming_with_compression():
    """The streaming step's magnitude-compression branch (STFTFeature
    compression= on both the analysis and synthesis sides) matches offline."""
    from use_tpu.models.gan.csmgan import CSMGANStream

    wrapper = CSMGANWrapper(
        n_fft=96, win_length=96, hop_length=48, input_freq=48,
        compression="sqrt",
        encoder_channels=(4, 4, 8), encoder_depths=(1, 1),
        decoder_depths=(1, 1), tcn_input_dim=96, tcn_bn_dim=32,
        tcn_hidden_dim=32, tcn_layers=2, tcn_stacks=1, in_proj_channels=4,
    )
    params = wrapper.init_params(jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    k, hop = 2, 48
    wav = jnp.asarray(rng.standard_normal((1, 6 * k * hop)).astype(np.float32))

    offline = np.asarray(wrapper(params, {"perturbed": wav})["fake"])
    sess = CSMGANStream(wrapper, params, batch_size=1, chunk_frames=k)
    pieces = [
        np.asarray(sess.step(wav[:, i * k * hop : (i + 1) * k * hop]))
        for i in range(6)
    ]
    pieces.append(np.asarray(sess.flush()))
    stream = np.concatenate(pieces, axis=1)
    np.testing.assert_allclose(stream, offline, atol=5e-4, rtol=1e-3)
