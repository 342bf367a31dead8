"""Golden parity: use_tpu NCSN++ (Flax/NHWC) vs reference torch NCSN++.

Random torch weights are converted with convert_ncsnpp_state_dict and the two
forward passes compared on identical inputs. This validates the full module
walk (topology, FIR resampling arithmetic, attention, embeddings, output
projection) in one shot.
"""
import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_harness import import_reference
from use_tpu.engine.convert_torch import convert_ncsnpp_state_dict
from use_tpu.models.ncsnpp.ncsnpp import NCSNpp, NCSNppConfig

import_reference()
from src.models.components.sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp  # noqa: E402


def _run_pair(torch_kwargs, jax_cfg, f, t, input_channels, time_cond=True, seed=0):
    torch.manual_seed(seed)
    tnet = TorchNCSNpp(**torch_kwargs)
    tnet.eval()

    rng = np.random.default_rng(seed)
    n_complex = input_channels // 2
    x_np = rng.standard_normal((2, n_complex, f, t, 2)).astype(np.float32)
    x_torch = torch.view_as_complex(torch.from_numpy(x_np))
    t_np = (rng.uniform(0.05, 0.95, size=(2,))).astype(np.float32)

    with torch.no_grad():
        ref = tnet(x_torch, torch.from_numpy(t_np) if time_cond else None)
    ref = np.stack([ref.real.numpy(), ref.imag.numpy()], axis=-1)  # [B, D, F, T, 2]

    params = convert_ncsnpp_state_dict(tnet.state_dict())
    jnet = NCSNpp(cfg=jax_cfg)
    # NHWC input: [B, F, T, C] with per-complex (re, im) channel order
    x_jax = np.concatenate(
        [x_np[:, i] for i in range(n_complex)], axis=-1
    )  # [B, F, T, 2*n_complex]
    with jax.default_matmul_precision("highest"):
        got = jnet.apply(
            {"params": params}, jnp.asarray(x_jax),
            jnp.asarray(t_np) if time_cond else None,
        )
    got = np.asarray(got)  # [B, F, T, D, 2]
    got = np.transpose(got, (0, 3, 1, 2, 4))
    np.testing.assert_allclose(got, ref, atol=2e-4, rtol=2e-3)


def test_ncsnpp_tiny_parity():
    """Default biggan/output_skip/input_skip topology, conditional."""
    kw = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, input_channels=4)
    cfg = NCSNppConfig(nf=16, ch_mult=(1, 2), num_res_blocks=1, input_channels=4)
    _run_pair(kw, cfg, f=32, t=16, input_channels=4)


def test_ncsnpp_attention_and_depth_parity():
    """3 levels with an attention resolution actually hit in the walk."""
    kw = dict(
        nf=8, ch_mult=(1, 1, 2), num_res_blocks=2, input_channels=4,
        image_size=32, attn_resolutions=(16,),
    )
    cfg = NCSNppConfig(
        nf=8, ch_mult=(1, 1, 2), num_res_blocks=2, input_channels=4,
        image_size=32, attn_resolutions=(16,),
    )
    _run_pair(kw, cfg, f=32, t=32, input_channels=4, seed=1)


def test_ncsnpp_discriminative_parity():
    """discriminative=True: no conditioning, 2 input channels (LSGAN G mode)."""
    kw = dict(nf=16, ch_mult=(1, 2), num_res_blocks=1, discriminative=True)
    cfg = NCSNppConfig(nf=16, ch_mult=(1, 2), num_res_blocks=1, discriminative=True)
    _run_pair(kw, cfg, f=32, t=16, input_channels=2, time_cond=False, seed=2)


@pytest.mark.slow
def test_ncsnpp_large_param_count():
    """ncsnpplarge ~= 60M params (reference ncsnpp.py:506-509)."""
    from use_tpu.models.registry import BackboneRegistry

    net = BackboneRegistry.get_by_name("ncsnpplarge")()
    params = net.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 64, 4)), jnp.full((1,), 0.5)
    )["params"]
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    assert 50e6 < n < 75e6, n
