"""Tests for use_tpu.ops.gn_stats (one-pass GroupNorm statistics).

On the CPU test backend `pallas_ok` is False, so these exercise the public
API through the XLA fallback; the Pallas kernel itself is validated on TPU
(max |err| ~1e-6 vs the XLA path at serving shapes, exact grads) and shares
the same custom_vjp.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from use_tpu.ops.gn_stats import channel_sums, group_mean_meansq, pallas_ok


def test_channel_sums_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((3, 64, 16)).astype(np.float32)
    s, ss = channel_sums(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(s), x.sum(1), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ss), (x ** 2).sum(1), rtol=1e-5, atol=1e-5)


def test_group_mean_meansq_matches_groupnorm_form():
    rng = np.random.default_rng(1)
    b, ssz, c, g = 2, 48, 24, 6
    x = rng.standard_normal((b, ssz, c)).astype(np.float32)
    mean, meansq = group_mean_meansq(jnp.asarray(x), g)
    xg = x.reshape(b, ssz, g, c // g)
    np.testing.assert_allclose(np.asarray(mean), xg.mean(axis=(1, 3)), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(meansq), (xg ** 2).mean(axis=(1, 3)), rtol=1e-5
    )


def test_custom_vjp_exact():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))

    def via_op(x):
        s, ss = channel_sums(x)
        return jnp.sum(jnp.sin(s)) + jnp.sum(ss * 0.5)

    def via_jnp(x):
        s = jnp.sum(x, axis=1)
        ss = jnp.sum(jnp.square(x), axis=1)
        return jnp.sum(jnp.sin(s)) + jnp.sum(ss * 0.5)

    g1 = jax.grad(via_op)(x)
    g2 = jax.grad(via_jnp)(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_pallas_gate_rejects_bad_shapes():
    # Pass tile_s explicitly so the test is independent of the
    # USE_TPU_GN_TILE env default (ADVICE r1).
    tile = 4096
    ok_like = jnp.zeros((2, tile * 4, 128), jnp.bfloat16)
    assert pallas_ok(ok_like, tile_s=tile) == (
        jax.default_backend() in ("tpu", "axon")
    )
    # channel count not lane-aligned
    assert not pallas_ok(jnp.zeros((2, tile * 4, 96), jnp.bfloat16), tile_s=tile)
    # spatial size not tileable
    assert not pallas_ok(jnp.zeros((2, tile * 4 + 1, 128), jnp.bfloat16), tile_s=tile)
    # too small to be worth a kernel launch
    assert not pallas_ok(jnp.zeros((2, 512, 128), jnp.bfloat16), tile_s=tile)


def test_groupnormact_pallas_flag_path(monkeypatch):
    """GroupNormAct with the pallas flag on falls back cleanly on CPU."""
    import use_tpu.models.ncsnpp.layers as L

    monkeypatch.setattr(L, "_PALLAS_GN", True)
    m = L.GroupNormAct(channels=16, act=jax.nn.silu)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((2, 8, 8, 16)), jnp.float32
    )
    params = m.init(jax.random.PRNGKey(0), x)
    y1 = m.apply(params, x)
    monkeypatch.setattr(L, "_PALLAS_GN", False)
    y2 = m.apply(params, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)
