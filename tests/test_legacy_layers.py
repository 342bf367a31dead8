"""NCSNv1 legacy layer zoo: shapes, conditioning, pooling semantics."""
from functools import partial

import numpy as np
import jax
import jax.numpy as jnp

from use_tpu.models.ncsnpp.legacy_layers import (
    CRPBlock,
    ConvMeanPool,
    MSFBlock,
    MeanPoolConv,
    RCUBlock,
    RefineBlock,
    ResidualBlock,
    UpsampleConv,
    _bilinear_resize,
    _mean_pool_2x,
)
from use_tpu.models.ncsnpp.normalization import ConditionalInstanceNorm2dPlus

RNG = jax.random.PRNGKey(0)


def test_blocks_shapes():
    x = jax.random.normal(RNG, (2, 16, 16, 8))
    cases = [
        (CRPBlock(8, 2), (2, 16, 16, 8)),
        (RCUBlock(8, 2, 2), (2, 16, 16, 8)),
        (ConvMeanPool(12), (2, 8, 8, 12)),
        (MeanPoolConv(12), (2, 8, 8, 12)),
        (UpsampleConv(12), (2, 32, 32, 12)),
        (ResidualBlock(12, resample="down"), (2, 8, 8, 12)),
        (ResidualBlock(8), (2, 16, 16, 8)),
    ]
    for mod, shape in cases:
        p = mod.init(RNG, x)
        o = mod.apply(p, x)
        assert o.shape == shape, type(mod).__name__
        assert bool(jnp.isfinite(o).all()), type(mod).__name__


def test_refine_and_msf_fuse_scales():
    x0 = jax.random.normal(RNG, (2, 16, 16, 8))
    x1 = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 4))
    msf = MSFBlock(8, 2)
    p = msf.init(RNG, [x0, x1], (16, 16))
    assert msf.apply(p, [x0, x1], (16, 16)).shape == (2, 16, 16, 8)
    rb = RefineBlock(8, (8, 4), end=True)
    p = rb.init(RNG, [x0, x1], (16, 16))
    assert rb.apply(p, [x0, x1], (16, 16)).shape == (2, 16, 16, 8)


def test_conditional_residual_block():
    x = jax.random.normal(RNG, (2, 16, 16, 8))
    y = jnp.array([0, 3])
    norm = partial(ConditionalInstanceNorm2dPlus, num_classes=4)
    mod = ResidualBlock(8, normalizer=norm)
    p = mod.init(RNG, x, y)
    a = mod.apply(p, x, y)
    b = mod.apply(p, x, jnp.array([1, 2]))
    assert a.shape == x.shape
    # class conditioning must change the output
    assert float(jnp.abs(a - b).max()) > 1e-6


def test_mean_pool_matches_avg_pool():
    x = jax.random.normal(RNG, (1, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(_mean_pool_2x(x)),
        np.asarray(x.reshape(1, 4, 2, 4, 2, 3).mean(axis=(2, 4))),
        atol=1e-6,
    )


def test_bilinear_align_corners_identity():
    x = jax.random.normal(RNG, (1, 6, 5, 2))
    np.testing.assert_allclose(
        np.asarray(_bilinear_resize(x, (6, 5))), np.asarray(x), atol=1e-6
    )
    # endpoints preserved under upsampling (align_corners=True semantics)
    up = _bilinear_resize(x, (11, 9))
    np.testing.assert_allclose(np.asarray(up[0, 0, 0]), np.asarray(x[0, 0, 0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(up[0, -1, -1]), np.asarray(x[0, -1, -1]), atol=1e-6)
