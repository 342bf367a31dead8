"""Exactness of the fused residual-shortcut Pallas kernel (CPU interpret).

fused_skip_add must match the XLA formulation (conv1x1 + add + rescale) to
fp32 accumulation tolerance on representative shapes, including bf16
inputs with fp32 accumulation.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from use_tpu.ops.pallas_skip import fused_skip_add, reference_skip_add


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_skip_add_matches_reference(dtype, monkeypatch):
    # interpret mode on CPU (no TPU in CI)
    from jax.experimental import pallas as pl

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, 8, 128, 256)), dtype)
    h = jnp.asarray(rng.standard_normal((2, 8, 128, 128)), dtype)
    w = jnp.asarray(0.1 * rng.standard_normal((256, 128)), dtype)
    b = jnp.asarray(0.1 * rng.standard_normal((128,)), dtype)

    import functools

    import use_tpu.ops.pallas_skip as ps

    orig = pl.pallas_call
    monkeypatch.setattr(
        ps.pl, "pallas_call", functools.partial(orig, interpret=True)
    )
    got = fused_skip_add(x, h, w, b, scale=2 ** -0.5, tile_h=2)
    want = reference_skip_add(x, h, w, b, scale=2 ** -0.5)
    atol = 1e-5 if dtype == jnp.float32 else 0.05
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32), atol=atol
    )
    assert got.dtype == h.dtype
