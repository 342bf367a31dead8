"""Engine tests: optimizer semantics, EMA, schedulers, checkpointing, and a
tiny end-to-end fit_sgmse run over the real data pipeline."""
import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from use_tpu.config.config import load_config, parse_overrides
from use_tpu.data.audio_io import write_wav
from use_tpu.data.datamodule import DistortDataModule
from use_tpu.data.distort_dataset import DistortConfig
from use_tpu.engine import optim
from use_tpu.engine.checkpoint import CheckpointManager
from use_tpu.engine.loop import fit_sgmse
from use_tpu.engine.state import TrainState
from use_tpu.models.sgmse.score_model import ScoreModel

SR = 24000


def test_step_lr_schedule():
    sched = optim.step_lr(1.0, step_size=30, gamma=0.5)
    assert float(sched(0)) == 1.0
    assert float(sched(29)) == 1.0
    assert float(sched(30)) == 0.5
    assert float(sched(60)) == 0.25


def test_adam_freezes_gfp_w():
    """The Gaussian-Fourier W must not move (requires_grad=False in ref)."""
    model = ScoreModel(
        backbone="ncsnpp", condition="noisy", sde_input="noisy",
        n_fft=254, hop_length=64, num_frames=16,
        backbone_kwargs=dict(nf=8, ch_mult=(1,), num_res_blocks=1),
    )
    params = model.init_params(jax.random.PRNGKey(0))
    tx = optim.adam(lr=1e-2, weight_decay=1e-3, params_example=params)
    state = TrainState.create(params, tx)

    batch = {
        "clean": jnp.asarray(np.random.default_rng(0).standard_normal((1, 1500)), jnp.float32),
        "perturbed": jnp.asarray(np.random.default_rng(1).standard_normal((1, 1500)), jnp.float32),
    }
    grads = jax.grad(lambda p: model.train_loss(p, batch, jax.random.PRNGKey(2)))(
        state.params
    )
    new_state = state.apply_gradients(grads, tx)
    w_before = params["m0"]["W"]
    w_after = new_state.params["m0"]["W"]
    np.testing.assert_array_equal(np.asarray(w_before), np.asarray(w_after))
    # but other params moved
    k_before = params["m3"]["kernel"] if "m3" in params else None
    moved = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))), params, new_state.params),
    )
    assert moved > 0


def test_ema_tracks_params():
    params = {"w": jnp.zeros((2,))}
    tx = optim.adam(lr=1.0, weight_decay=0.0)
    state = TrainState.create(params, tx, ema_decay=0.5)
    grads = {"w": jnp.ones((2,))}
    state = state.apply_gradients(grads, tx)
    assert not np.allclose(np.asarray(state.ema_params["w"]), np.asarray(state.params["w"]))
    # ema = 0.5*0 + 0.5*new
    np.testing.assert_allclose(
        np.asarray(state.ema_params["w"]), 0.5 * np.asarray(state.params["w"]), atol=1e-6
    )


def test_checkpoint_roundtrip(tmp_path):
    params = {"a": jnp.arange(4.0), "b": {"c": jnp.ones((2, 2))}}
    tx = optim.adam(lr=1e-3)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(str(tmp_path / "ck"), monitor="val/loss")
    mgr.save(0, state, {"val/loss": 1.0})
    mgr.save(1, state.replace(step=state.step + 5), {"val/loss": 0.5})
    restored = mgr.restore(template=state)
    assert int(restored.step) == 5
    assert mgr.best_step() == 1
    np.testing.assert_allclose(np.asarray(restored.params["a"]), np.arange(4.0))
    mgr.close()


def test_checkpoint_async_save(tmp_path):
    """async_save=True: save() returns without blocking on serialization;
    wait()/close() join the background write and the checkpoint restores."""
    params = {"a": jnp.arange(4.0)}
    tx = optim.adam(lr=1e-3)
    state = TrainState.create(params, tx)
    mgr = CheckpointManager(
        str(tmp_path / "ck"), monitor="val/loss", async_save=True
    )
    mgr.save(0, state, {"val/loss": 1.0})
    mgr.wait()
    restored = mgr.restore(template=state)
    np.testing.assert_allclose(np.asarray(restored.params["a"]), np.arange(4.0))
    mgr.close()


def test_config_system():
    cfg = load_config("SGMSE_Large")
    assert cfg["model"]["backbone"] == "ncsnpplarge"
    assert cfg["model"]["n_fft"] == 1022
    dbg = load_config("SGMSE_debug", ["model.t_eps=0.05"])
    assert dbg["model"]["backbone"] == "ncsnpp6M"
    assert dbg["model"]["t_eps"] == 0.05
    assert dbg["model"]["sde"] == "ouve"  # inherited
    ov = parse_overrides(["a.b=1e-3", "a.c=[1,2]", "d=true"])
    assert ov == {"a": {"b": 1e-3, "c": [1, 2]}, "d": True}
    # the shipping recipes must carry the remat settings that make their
    # training steps fit one v5e (BASELINE.md training section)
    assert cfg["model"]["backbone_kwargs"] == {
        "remat": True, "remat_policy": "conv_outs"
    }
    lsgan = load_config("LSGAN")
    assert lsgan["model"]["generator"]["backbone_kwargs"] == {
        "remat": True, "remat_policy": "conv_outs"
    }


def test_shipping_config_builds_remat_model():
    """_build_model threads backbone_kwargs into the backbone config."""
    from use_tpu.cli.main import _build_model

    model = _build_model(load_config("SGMSE_Large"))
    assert model.score_net.cfg.remat is True
    assert model.score_net.cfg.remat_policy == "conv_outs"


@pytest.fixture
def tiny_dm(tmp_path):
    rng = np.random.default_rng(0)
    jsons = {}
    for kind in ("clean", "noise"):
        files = []
        for i in range(2):
            p = str(tmp_path / f"{kind}{i}.wav")
            write_wav(p, rng.standard_normal(SR).astype(np.float32) * 0.3, SR)
            files.append(p)
        jp = str(tmp_path / f"{kind}.jsonl")
        with open(jp, "w") as f:
            for p in files:
                f.write(json.dumps({"file_path": p, "duration": 1.0, "sample_rate": SR}) + "\n")
        jsons[kind] = jp
    cfg = DistortConfig(
        clean_json_path=jsons["clean"], noise_json_path=jsons["noise"],
        speech_splice_seconds=1, reverb_use_FRA=True, min_duration_seconds=0.5,
        codecs_prob=0, packet_loss_prob=0, spectral_time_freq_holes_prob=0,
        colored_noise_prob=0, colored_noise_post_prob=0, lowpass_prob=0,
        eq_perturb_prob=0, band_reject_prob=0, reverb_prob=0, clip_prob=0,
    )
    return DistortDataModule(train_cfg=cfg, batch_size=2, num_workers=0)


def test_fit_sgmse_end_to_end(tiny_dm, tmp_path):
    """One epoch of real training over the distortion pipeline: loss finite,
    checkpoint written, resume restores."""
    model = ScoreModel(
        backbone="ncsnpp", condition="noisy", sde_input="noisy",
        n_fft=126, hop_length=32, num_frames=32,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    result = fit_sgmse(
        model, tiny_dm, lr=1e-4, accumulate_grad_batches=2, max_epochs=1,
        ckpt_dir=str(tmp_path / "ckpt"), seed=0,
    )
    assert len(result.history) == 1
    assert np.isfinite(result.history[0]["train/loss_Score"])
    assert int(result.state.step) == 1  # one optimizer step (1 batch, accum over it)

    # resume continues from epoch 1
    result2 = fit_sgmse(
        model, tiny_dm, lr=1e-4, accumulate_grad_batches=2, max_epochs=2,
        ckpt_dir=str(tmp_path / "ckpt"), resume=True, seed=0,
    )
    assert [r["epoch"] for r in result2.history] == [1]


def test_lenient_param_load(tmp_path):
    """Shape-tolerant checkpoint load (reference LSGAN_module.py:51-61):
    matching leaves restored, mismatched/missing leaves keep the template."""
    from use_tpu.engine.checkpoint import (
        load_params,
        merge_params_lenient,
        save_params,
    )

    saved = {
        "a": jnp.full((3,), 2.0),
        "blk": {"w": jnp.full((2, 2), 5.0), "old": jnp.ones((4,))},
    }
    path = str(tmp_path / "p")
    save_params(path, saved)

    template = {
        "a": jnp.zeros((3,)),                 # matches -> restored
        "blk": {"w": jnp.zeros((2, 3)),       # shape mismatch -> kept
                "new": jnp.full((2,), 7.0)},  # missing -> kept
    }
    # 2 of 3 template leaves are skipped -> the default guard
    # (max_skipped_frac=0.5) refuses the load instead of silently
    # degrading to mostly fresh-init params (ADVICE r1).
    with pytest.raises(ValueError, match="skipped"):
        load_params(path, template=template, lenient=True)

    merged = load_params(path, template=template, lenient=True,
                         max_skipped_frac=1.0)
    np.testing.assert_allclose(np.asarray(merged["a"]), 2.0 * np.ones(3))
    np.testing.assert_allclose(np.asarray(merged["blk"]["w"]), np.zeros((2, 3)))
    np.testing.assert_allclose(np.asarray(merged["blk"]["new"]), 7.0 * np.ones(2))

    _, skipped = merge_params_lenient(template, saved)
    # two-way report (reference LSGAN_module.py:59-60): template-side
    # mismatch + missing, plus the checkpoint-only leaf.
    assert sorted(skipped) == [
        "blk/new [missing]",
        "blk/old [loaded-only]",
        "blk/w [shape (2, 2) != (2, 3)]",
    ]


def test_predict_with_ema_params_differs(tiny_dm, tmp_path):
    """EMA consumed at inference (VERDICT r2 item 9): a training checkpoint
    written with ema_decay>0 exposes ema_params via the CLI loader
    (ckpt.use_ema), and they differ from the raw params — the legacy path's
    EMA-swap-at-eval semantics (reference sgmse/model.py:123-139)."""
    from use_tpu.cli.main import _load_state_params

    model = ScoreModel(
        backbone="ncsnpp", condition="noisy", sde_input="noisy",
        n_fft=126, hop_length=32, num_frames=32,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    ckpt_dir = str(tmp_path / "ckpt")
    fit_sgmse(
        model, tiny_dm, lr=1e-2, accumulate_grad_batches=1, max_epochs=1,
        ema_decay=0.5, ckpt_dir=ckpt_dir, seed=0,
    )
    cfg = {
        "task": "sgmse",
        "train": {"lr": 1e-2, "weight_decay": 1e-7, "grad_clip": 100.0,
                  "ema_decay": 0.5},
    }
    raw = _load_state_params(model, cfg, ckpt_dir)
    ema = _load_state_params(model, cfg, ckpt_dir, use_ema=True)
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), raw, ema
    )
    assert max(jax.tree.leaves(diffs)) > 0.0


def test_fit_sgmse_rich_eval_every(tiny_dm, tmp_path):
    """Opt-in per-K-epoch rich eval inside fit_sgmse: metrics logged with
    val/ prefixes (inference.py:23-101 run per val epoch in the reference)."""
    from use_tpu.utils.logging import MetricLogger

    model = ScoreModel(
        backbone="ncsnpp", condition="noisy", sde_input="noisy",
        n_fft=126, hop_length=32, num_frames=32,
        backbone_kwargs=dict(nf=8, ch_mult=(1, 1), num_res_blocks=1),
    )
    logger = MetricLogger(csv_path=str(tmp_path / "m.csv"))
    fit_sgmse(
        model, tiny_dm, lr=1e-4, accumulate_grad_batches=1, max_epochs=1,
        seed=0, logger=logger, rich_eval_every=1, rich_eval_files=1,
        rich_eval_N=2,
    )
    content = open(tmp_path / "m.csv").read()
    assert "val/si_sdr" in content and "val/lsd" in content
