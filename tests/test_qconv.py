"""Int8 serving-path tests (use_tpu/ops/qconv.py).

The quantized conv must (1) keep the exact nn.Conv param tree so bf16/int8
serving share checkpoints, (2) match the mathematical dequantization
identity, and (3) stay close to the fp32 forward through a full NCSN++
backbone (every quantized conv input is freshly GroupNorm-ed).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from use_tpu.ops.qconv import (
    QConv,
    qconv2d,
    quantize_per_sample,
    quantize_weight_per_cout,
)


def test_quantize_per_sample_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 5, 7, 8)), jnp.float32)
    q, s = quantize_per_sample(x)
    assert q.dtype == jnp.int8 and s.shape == (3,)
    deq = q.astype(jnp.float32) * s[:, None, None, None]
    # max-abs symmetric quantization: error bounded by half a step
    err = np.max(np.abs(np.asarray(deq - x)))
    step = float(jnp.max(s))
    assert err <= 0.5 * step + 1e-6
    # the max element hits +-127 exactly
    assert int(jnp.max(jnp.abs(q.astype(jnp.int32)))) == 127


def test_quantize_weight_per_cout_scales():
    rng = np.random.default_rng(1)
    w = jnp.asarray(rng.standard_normal((3, 3, 4, 6)), jnp.float32)
    q, s = quantize_weight_per_cout(w)
    assert q.dtype == jnp.int8 and s.shape == (6,)
    # per-channel max dequantizes to itself within half a step
    deq = q.astype(jnp.float32) * s
    assert np.max(np.abs(np.asarray(deq - w))) <= 0.5 * float(jnp.max(s)) + 1e-6


def test_qconv2d_matches_quantized_reference():
    """qconv2d == conv(dequant(qx), dequant(qw)) exactly (int32 accumulate)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 4)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((3, 3, 4, 8)), jnp.float32)
    y = qconv2d(x, w, padding=[(1, 1), (1, 1)])

    qx, sx = quantize_per_sample(x)
    qw, sw = quantize_weight_per_cout(w)
    ref = jax.lax.conv_general_dilated(
        qx.astype(jnp.float32) * sx[:, None, None, None],
        qw.astype(jnp.float32) * sw,
        (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_qconv_param_tree_matches_nn_conv():
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    q = QConv(6, (3, 3), padding=1, min_channels=1)  # force the int8 path
    f = nn.Conv(6, (3, 3), padding=1)
    pq = q.init(jax.random.PRNGKey(0), x)["params"]
    pf = f.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(pq) == jax.tree_util.tree_structure(pf)
    assert all(
        a.shape == b.shape
        for a, b in zip(jax.tree_util.tree_leaves(pq), jax.tree_util.tree_leaves(pf))
    )
    # same init -> quantized forward close to the exact one
    yq = q.apply({"params": pf}, x)
    yf = f.apply({"params": pf}, x)
    rel = float(jnp.linalg.norm(yq - yf) / jnp.linalg.norm(yf))
    assert 1e-8 < rel < 0.05, rel  # quantized: close but NOT exact


def test_qconv_intensity_gate_falls_back_to_exact():
    """Below min_channels the conv runs the exact bf16/fp32 path."""
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 4)), jnp.float32)
    q = QConv(6, (3, 3), padding=1)  # default gate: 4,6 < 192 -> exact
    f = nn.Conv(6, (3, 3), padding=1)
    pf = f.init(jax.random.PRNGKey(0), x)["params"]
    yq = q.apply({"params": pf}, x)
    yf = f.apply({"params": pf}, x)
    np.testing.assert_allclose(np.asarray(yq), np.asarray(yf), rtol=2e-5,
                               atol=2e-5)


def test_ncsnpp_int8_param_tree_and_deviation():
    """quant='int8' backbone shares the param tree with the bf16/fp32 one
    and its forward stays within a few percent on a random init."""
    from use_tpu.models import BackboneRegistry

    net_f = BackboneRegistry.get_by_name("ncsnpp6M")()
    net_q = BackboneRegistry.get_by_name("ncsnpp6M")(
        quant="int8", quant_min_channels=1
    )
    rng = np.random.default_rng(4)
    x = jnp.asarray(0.3 * rng.standard_normal((2, 64, 64, 4)), jnp.float32)
    t = jnp.full((2,), 0.5)
    p = net_f.init(jax.random.PRNGKey(0), x, t)["params"]
    pq = net_q.init(jax.random.PRNGKey(0), x, t)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pq)

    of = net_f.apply({"params": p}, x, t)
    oq = net_q.apply({"params": p}, x, t)
    rel = float(jnp.linalg.norm(of - oq) / jnp.linalg.norm(of))
    assert rel < 0.10, rel


def test_ncsnpp_int8_pallas_param_tree_and_deviation():
    """quant='int8_pallas' (Pallas fused operand-read quantize) shares the
    param tree with the fp32 backbone and stays close on a random init —
    interpret mode on CPU, the same kernel code that runs on TPU."""
    from use_tpu.models import BackboneRegistry

    net_f = BackboneRegistry.get_by_name("ncsnpp6M")()
    net_q = BackboneRegistry.get_by_name("ncsnpp6M")(
        quant="int8_pallas", quant_min_channels=1
    )
    rng = np.random.default_rng(5)
    x = jnp.asarray(0.3 * rng.standard_normal((1, 64, 64, 4)), jnp.float32)
    t = jnp.full((1,), 0.5)
    p = net_f.init(jax.random.PRNGKey(0), x, t)["params"]
    pq = net_q.init(jax.random.PRNGKey(0), x, t)["params"]
    assert jax.tree_util.tree_structure(p) == jax.tree_util.tree_structure(pq)

    of = net_f.apply({"params": p}, x, t)
    oq = net_q.apply({"params": p}, x, t)
    rel = float(jnp.linalg.norm(of - oq) / jnp.linalg.norm(of))
    assert rel < 0.10, rel
