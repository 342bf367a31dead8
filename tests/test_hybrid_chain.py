"""Hybrid SGMSE+GAN chain evidence (VERDICT r4 item 1).

The reference ships two-stage hybrid inference (README.md:174-179): SGMSE
enhances then LSGAN refines, or the LSGAN output becomes the diffusion
conditioning/prior (`condition=both|denoised`, `sde_input=denoised` —
model_wrapper.py:282-329). These tests cover:

  * golden parity of the conditioning plumbing — full `sample()` with a
    'fake' key, zero noise, converted weights, vs the reference wrapper —
    for (condition=both, sde_input=denoised) and
    (condition=denoised, sde_input=noisy);
  * both chain orders end-to-end through the CLI (cmd_predict);
  * `second.`-prefixed overrides reaching the second stage's config.

The measured hybrid quality/bench rows live in scripts/soak_train_tpu.py
(--quality-gate, hybrid leg) and BASELINE.md.
"""
import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.reference_harness import import_reference
from use_tpu.cli.main import main
from use_tpu.data.audio_io import read_wav, write_wav
from use_tpu.engine.convert_torch import convert_ncsnpp_state_dict
from use_tpu.models.sgmse import sampling
from use_tpu.models.sgmse.score_model import ScoreModel

import_reference()
from src.models.components.sgmse.model_wrapper import ScoreModel as TorchScoreModel  # noqa: E402
from src.models.components.sgmse.backbones.ncsnpp import NCSNpp as TorchNCSNpp  # noqa: E402

SR = 24000


@pytest.mark.parametrize(
    "condition,sde_input",
    [("both", "denoised"), ("denoised", "noisy")],
)
def test_hybrid_conditioning_golden_parity(condition, sde_input, monkeypatch):
    """ScoreModel.sample with batch['fake'] vs the reference wrapper's
    sample(), zero sampling noise, converted tiny-NCSN++ weights: checks
    the extra conditioning channels, the denoised prior mean, and the
    fake_sde_enhanced/enhanced output-key contract in one shot
    (model_wrapper.py:270-329)."""
    n_fft, hop, frames = 254, 64, 32
    in_ch = 6 if condition == "both" else 4

    torch.manual_seed(0)
    tnet = TorchNCSNpp(nf=16, ch_mult=(1, 2), num_res_blocks=1,
                       input_channels=in_ch)
    tnet.eval()

    # reference wrapper with the tiny backbone grafted in (the ctor only
    # builds full-size registry backbones)
    twrap = TorchScoreModel(
        backbone="none", sde="ouve", condition=condition, sde_input=sde_input,
        n_fft=n_fft, hop_length=hop, num_frames=frames,
    )
    twrap.score_net = tnet
    twrap.eval()

    model = ScoreModel(
        backbone="ncsnpp", sde="ouve", condition=condition,
        sde_input=sde_input, n_fft=n_fft, hop_length=hop, num_frames=frames,
        backbone_kwargs=dict(nf=16, ch_mult=(1, 2), num_res_blocks=1),
    )
    params = convert_ncsnpp_state_dict(tnet.state_dict())

    rng = np.random.default_rng(1)
    wav = rng.standard_normal((1, 1984)).astype(np.float32) * 0.1
    fake = (wav + 0.02 * rng.standard_normal(wav.shape)).astype(np.float32)

    # zero noise on both sides
    monkeypatch.setattr(
        sampling, "crandn",
        lambda r, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    import use_tpu.models.sgmse.sdes as sdes_mod
    monkeypatch.setattr(
        sdes_mod, "crandn",
        lambda r, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
    )
    monkeypatch.setattr(torch, "randn_like", lambda x: torch.zeros_like(x))

    out_key = "fake_sde_enhanced" if sde_input == "denoised" else "enhanced"

    with jax.default_matmul_precision("highest"):
        out = model.sample(
            params,
            {"perturbed": jnp.asarray(wav), "fake": jnp.asarray(fake)},
            jax.random.PRNGKey(0), N=5,
        )
    assert out_key in out and "enhanced" not in (set(out) - {out_key, "perturbed", "fake"})

    with torch.no_grad():
        ref_batch = twrap.sample(
            {"perturbed": torch.from_numpy(wav), "fake": torch.from_numpy(fake)},
            N=5,
        )
    ref = ref_batch[out_key].numpy()
    np.testing.assert_allclose(np.asarray(out[out_key]), ref,
                               rtol=2e-3, atol=2e-4)


@pytest.fixture
def wav_folder(tmp_path):
    src = tmp_path / "in" / "sub"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for i in range(2):
        write_wav(str(src / f"u{i}.wav"),
                  rng.standard_normal(4000).astype(np.float32) * 0.2, SR)
    return str(tmp_path / "in"), str(tmp_path / "out")


def test_cli_chain_sgmse_then_gan(wav_folder):
    """predict.chain=sgmse+gan: diffusion output refined by the GAN
    (reference README.md:174-179, first order)."""
    data, target = wav_folder
    main([
        "predict", "experiment=SGMSE_debug", "infer.N=2",
        "predict.chain=sgmse+gan", "predict.second_experiment=LSGAN_debug",
        f"predict.data_folder={data}", f"predict.target_folder={target}",
    ])
    out = os.path.join(target, "sub", "u0.wav")
    assert os.path.exists(out)
    wav, sr = read_wav(out)
    assert sr == SR and len(wav) == 4000 and np.isfinite(wav).all()


def test_cli_chain_gan_then_sgmse(wav_folder):
    """predict.chain=gan+sgmse: the GAN output conditions the diffusion
    stage (condition=both) and is its prior mean (sde_input=denoised) —
    exercised via second.* overrides on the second experiment."""
    data, target = wav_folder
    main([
        "predict", "experiment=LSGAN_debug", "infer.N=2",
        "predict.chain=gan+sgmse", "predict.second_experiment=SGMSE_debug",
        "second.model.condition=both", "second.model.sde_input=denoised",
        f"predict.data_folder={data}", f"predict.target_folder={target}",
    ])
    out = os.path.join(target, "sub", "u1.wav")
    assert os.path.exists(out)
    wav, sr = read_wav(out)
    assert sr == SR and len(wav) == 4000 and np.isfinite(wav).all()
