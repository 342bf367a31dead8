"""upfirdn2d parity vs a direct (zero-insert, pad, convolve, stride) golden.

Semantics under test are those of the reference CUDA op
(op/upfirdn2d.py:173-208 native composition).
"""
import numpy as np
import pytest
from scipy import signal

import jax.numpy as jnp

from use_tpu.ops.fused_act import fused_leaky_relu
from use_tpu.ops.upfirdn2d import (
    downsample_2d,
    naive_downsample_2d,
    naive_upsample_2d,
    setup_kernel,
    upfirdn2d,
    upsample_2d,
)


def upfirdn2d_golden(x, k, up, down, pad):
    """Direct per-image implementation of the op's definition."""
    h, w = x.shape
    ux = np.zeros((h * up, w * up), np.float64)
    ux[::up, ::up] = x
    ux = np.pad(ux, ((pad[0], pad[1]), (pad[0], pad[1])))
    out = signal.convolve2d(ux, k, mode="full")
    kh, kw = k.shape
    out = out[kh - 1 : out.shape[0] - (kh - 1), kw - 1 : out.shape[1] - (kw - 1)]
    return out[::down, ::down]


@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 2)), (2, 1, (2, 1)), (1, 2, (1, 1)), (2, 2, (3, 2))])
def test_upfirdn2d_matches_golden(up, down, pad):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 13, 11, 3)).astype(np.float32)
    k = setup_kernel([1.0, 3.0, 3.0, 1.0])

    got = np.asarray(upfirdn2d(jnp.asarray(x), k, up=up, down=down, pad=pad))
    for b in range(2):
        for c in range(3):
            ref = upfirdn2d_golden(x[b, :, :, c].astype(np.float64), k, up, down, pad)
            np.testing.assert_allclose(got[b, :, :, c], ref, atol=1e-5)


def test_fir_up_down_sample():
    """upsample_2d/downsample_2d equal the general upfirdn composition."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 16, 12, 4)).astype(np.float32)
    xj = jnp.asarray(x)
    k = (1.0, 3.0, 3.0, 1.0)
    kern = setup_kernel(k)

    p = len(k) - 2
    ref_up = upfirdn2d(xj, kern * 4.0, up=2, pad=((p + 1) // 2 + 1, p // 2))
    got_up = upsample_2d(xj, k, factor=2)
    assert got_up.shape == (1, 32, 24, 4)
    np.testing.assert_allclose(np.asarray(got_up), np.asarray(ref_up), atol=1e-5)

    ref_dn = upfirdn2d(xj, kern, down=2, pad=((p + 1) // 2, p // 2))
    got_dn = downsample_2d(xj, k, factor=2)
    assert got_dn.shape == (1, 8, 6, 4)
    np.testing.assert_allclose(np.asarray(got_dn), np.asarray(ref_dn), atol=1e-5)

    # constant-preserving: FIR upsampling of a constant stays constant
    const = jnp.ones((1, 8, 8, 1))
    up = np.asarray(upsample_2d(const))
    np.testing.assert_allclose(up[0, 2:-2, 2:-2, 0], 1.0, atol=1e-5)


def test_naive_resample():
    x = jnp.arange(16.0).reshape(1, 4, 4, 1)
    up = naive_upsample_2d(x)
    assert up.shape == (1, 8, 8, 1)
    assert float(up[0, 0, 0, 0]) == 0.0 and float(up[0, 1, 1, 0]) == 0.0
    dn = naive_downsample_2d(up)
    np.testing.assert_allclose(np.asarray(dn), np.asarray(x), atol=1e-6)


def test_fused_leaky_relu():
    x = jnp.asarray([[-1.0, 2.0]])
    b = jnp.asarray([0.5, -0.5])
    got = np.asarray(fused_leaky_relu(x, b))
    ref = np.array([[-0.5 * 0.2, 1.5]]) * np.sqrt(2.0)
    np.testing.assert_allclose(got, ref, atol=1e-6)
