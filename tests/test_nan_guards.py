"""Gradient NaN-guard regressions.

Exact-zero STFT bins are routine (zero-padded frames, silence), and several
magnitude forms have well-defined forward values at 0 but NaN gradients
without guards (sqrt'(0)=inf, 0*inf=NaN through jnp.where). Caught by the
TPU training soak (scripts/soak_train_tpu.py): LSGAN loss_G went NaN.
"""
import jax
import jax.numpy as jnp
import numpy as np

from use_tpu.models.ncsnpp.layers import GroupNormAct
from use_tpu.ops.stft import spec_back, spec_fwd
from use_tpu.ops.stft_feature import mag_phase, mag_unit_phase


def _grad_finite(f, x):
    g = jax.grad(lambda v: jnp.sum(f(v)))(x)
    return bool(jnp.all(jnp.isfinite(g)))


def test_spec_fwd_back_grads_at_zero():
    x = jnp.zeros((2, 4, 4, 2), jnp.float32)
    assert _grad_finite(spec_fwd, x)
    assert _grad_finite(spec_back, x)
    # mixed zero/nonzero
    x = x.at[0, 0, 0, 0].set(1.0)
    assert _grad_finite(spec_fwd, x)
    assert _grad_finite(spec_back, x)
    # forward parity against the plain formulation on nonzero input
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((3, 5, 5, 2)), jnp.float32)
    mag = jnp.sqrt(jnp.sum(jnp.square(y), axis=-1, keepdims=True))
    ref = y * mag ** (0.5 - 1.0) * 0.15
    np.testing.assert_allclose(np.asarray(spec_fwd(y)), np.asarray(ref), rtol=1e-5)


def test_mag_phase_grads_at_zero():
    x = jnp.zeros((3, 3, 2), jnp.float32).at[0, 0, 0].set(0.5)
    assert _grad_finite(lambda v: mag_phase(v)[0], x)
    assert _grad_finite(lambda v: mag_unit_phase(v)[0], x)


def test_groupnorm_var_cancellation():
    """Large constant channels: E[x^2]-E[x]^2 can be negative in fp32."""
    m = GroupNormAct(channels=8, act=None)
    x = jnp.full((1, 16, 16, 8), 513.37, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x)
    assert bool(jnp.all(jnp.isfinite(y)))
    g = jax.grad(lambda v: jnp.sum(m.apply(params, v)))(x)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_discriminators_finite_on_short_input():
    """8064-sample clips (num_frames=64 configs) stride to empty maps in the
    low-rate wave / mel discriminators without the minimum-length pads —
    mean over an empty map is NaN. Caught by the TPU soak."""
    from use_tpu.models.gan.discriminators import (
        MultiMelSpecDiscriminator,
        MultiWaveDiscriminator,
    )

    x = jnp.asarray(
        0.1 * np.random.default_rng(0).standard_normal((1, 8064)), jnp.float32
    )
    for mod in (MultiWaveDiscriminator(), MultiMelSpecDiscriminator()):
        params = mod.init(jax.random.PRNGKey(1), x)
        logits, _ = mod.apply(params, x)
        for l in logits:
            assert bool(jnp.all(jnp.isfinite(l))), type(mod).__name__
        for l in mod.apply(params, jnp.zeros_like(x))[0]:
            assert bool(jnp.all(jnp.isfinite(l))), type(mod).__name__


def test_spectral_convergence_grad_at_equality():
    from use_tpu.models.gan.losses import (
        WavSpecConvergenceConfig,
        wav_spec_convergence,
    )

    cfg = WavSpecConvergenceConfig(sampling_rate=24000)
    clean = jnp.asarray(
        np.random.default_rng(1).standard_normal((1, 4096)), jnp.float32
    )

    def loss_of(e):
        parts = wav_spec_convergence(clean, e, cfg)
        return sum(jnp.sum(v) for v in parts.values())

    g = jax.grad(loss_of)(clean)  # enhanced == clean exactly
    assert bool(jnp.all(jnp.isfinite(g)))
