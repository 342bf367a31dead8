"""Pallas fused int8 3x3 conv: bit-exactness vs the lax integer oracle.

The whole pipeline (affine, SiLU, quantize, int8 dots, int32 accumulate,
f32 dequant) is exact arithmetic, so the Pallas kernel (interpret mode on
CPU) must match the lax reference to f32 precision.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from use_tpu.ops.pallas_qconv import qconv3x3_fused, qconv3x3_reference


def _setup(B=2, H=8, W=16, C=128, O=128, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    k = jnp.asarray(
        (rng.standard_normal((3, 3, C, O)) * 0.1).astype(np.float32)
    )
    u = jnp.asarray((0.02 + 0.01 * rng.random(C)).astype(np.float32))
    return x, k, u, rng


@pytest.mark.parametrize("mode", ["dots9", "dots3", "im2col"])
def test_qconv3x3_matches_reference_plain(mode):
    x, k, u, _ = _setup()
    got = qconv3x3_fused(
        x, k, u, out_dtype=jnp.float32, tile_h=4, mode=mode, interpret=True
    )
    want = qconv3x3_reference(x, k, u, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_qconv3x3_matches_reference_fused_gn_act_bias():
    x, k, u, rng = _setup(B=2, H=8, W=16, C=128, O=128, seed=1)
    a = jnp.asarray((1.0 + 0.2 * rng.standard_normal((2, 128))).astype(np.float32))
    o = jnp.asarray((0.1 * rng.standard_normal((2, 128))).astype(np.float32))
    bias = jnp.asarray((0.05 * rng.standard_normal(128)).astype(np.float32))
    got = qconv3x3_fused(
        x, k, u, gn_scale=a, gn_shift=o, act=True, bias=bias,
        out_dtype=jnp.float32, tile_h=4, interpret=True,
    )
    want = qconv3x3_reference(
        x, k, u, gn_scale=a, gn_shift=o, act=True, bias=bias,
        out_dtype=jnp.float32,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_qconv3x3_edge_rows_zero_padded():
    """SAME zero padding at the first/last rows must match lax exactly
    (the halo DMA is replaced by explicit zeros at the image edges)."""
    x, k, u, _ = _setup(B=1, H=4, W=8, C=128, O=128, seed=2)
    got = qconv3x3_fused(
        x, k, u, out_dtype=jnp.float32, tile_h=4, interpret=True
    )
    want = qconv3x3_reference(x, k, u, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)


def test_qconv3x3_multi_row_tiles():
    """H spanning several TH tiles exercises the halo DMA rows."""
    x, k, u, _ = _setup(B=1, H=16, W=8, C=128, O=128, seed=3)
    got = qconv3x3_fused(
        x, k, u, out_dtype=jnp.float32, tile_h=4, interpret=True
    )
    want = qconv3x3_reference(x, k, u, out_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-5)
