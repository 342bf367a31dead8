"""CLI entry points: train / eval / predict.

Reference parity: src/train.py:42-131, src/eval.py:38-95, src/predict.py:39-92
with Hydra-style overrides:

    python -m use_tpu.cli.main train experiment=SGMSE_Large data.batch_size=8
    python -m use_tpu.cli.main predict experiment=SGMSE_Large \
        ckpt_path=... predict.data_folder=in/ predict.target_folder=out/
    python -m use_tpu.cli.main eval experiment=SGMSE_Large ckpt_path=...
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from typing import Dict, List, Optional

import numpy as np

from use_tpu.config.config import load_config
from use_tpu.utils.logging import MetricLogger, ranked_logger

log = ranked_logger()


_PREDICT_KEYS = {
    "predict.data_folder", "predict.target_folder", "predict.chain",
    "predict.second_experiment", "predict.second_ckpt",
}


def _split_args(argv: List[str]):
    experiment = None
    overrides = []
    extras: Dict[str, str] = {}
    for a in argv:
        if a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        elif a.startswith(("ckpt_path=", "ckpt.lenient=", "predict.", "out_dir=")):
            k, v = a.split("=", 1)
            if k.startswith("predict.") and k not in _PREDICT_KEYS:
                raise SystemExit(
                    f"unknown key {k!r}; predict options are "
                    f"{sorted(_PREDICT_KEYS)} (sampler settings go under "
                    f"infer.*, e.g. infer.N=30)"
                )
            extras[k] = v
        elif "=" in a:
            overrides.append(a)
        else:
            raise SystemExit(f"unrecognized argument {a!r} (use key=value)")
    if experiment is None:
        raise SystemExit("experiment=<name> is required")
    return experiment, overrides, extras


def _build_model(cfg: Dict):
    from use_tpu.models.sgmse.score_model import ScoreModel

    if cfg["task"] == "sgmse":
        m = dict(cfg["model"])
        return ScoreModel(**m)
    if cfg["task"] == "lsgan":
        from use_tpu.models.gan import losses
        from use_tpu.models.gan.generator import NCSNPPWrapper
        from use_tpu.models.gan.lsgan import LSGAN
        from use_tpu.models.registry import DiscriminatorRegistry

        gcfg = dict(cfg["model"]["generator"])
        gen = NCSNPPWrapper(**gcfg)
        disc = DiscriminatorRegistry.get_by_name(cfg["model"]["discriminator"])()
        lcfg = losses.HifiganGLossConfig(
            **cfg["model"]["g_loss"], enhanced_key=cfg["model"].get("enhanced_key", "fake")
        )
        return LSGAN(generator=gen, discriminator=disc, g_loss_cfg=lcfg)
    raise SystemExit(f"unknown task {cfg['task']}")


def _build_datamodule(cfg: Dict):
    from use_tpu.data.datamodule import DistortDataModule
    from use_tpu.data.distort_dataset import DistortConfig

    import jax

    d = dict(cfg["data"])
    batch_size = d.pop("batch_size", 4)
    num_workers = d.pop("num_workers", 4)
    overfit_items = d.pop("overfit_items", None)
    known = set(DistortConfig.__dataclass_fields__)
    dcfg = DistortConfig(**{k: v for k, v in d.items() if k in known})
    return DistortDataModule(
        train_cfg=dcfg, batch_size=batch_size, num_workers=num_workers,
        seed=cfg["train"].get("seed", 0), world_size=jax.process_count(),
        overfit_items=overfit_items,
    )


def cmd_train(experiment: str, overrides: List[str], extras: Dict[str, str]) -> None:
    from use_tpu.engine import loop
    from use_tpu.parallel.mesh import init_distributed

    init_distributed()
    cfg = load_config(experiment, overrides)
    out_dir = extras.get("out_dir", os.path.join("runs", experiment, time.strftime("%Y%m%d-%H%M%S")))
    logger = MetricLogger(
        csv_path=os.path.join(out_dir, "metrics.csv"),
        tensorboard_dir=os.path.join(out_dir, "tb"),
    )
    model = _build_model(cfg)
    dm = _build_datamodule(cfg)
    t = cfg["train"]
    if cfg["task"] == "sgmse":
        loop.fit_sgmse(
            model, dm, lr=t["lr"], weight_decay=t["weight_decay"],
            grad_clip=t.get("grad_clip", 100.0),
            accumulate_grad_batches=t.get("accumulate_grad_batches", 1),
            scheduler=t.get("scheduler"), max_epochs=t.get("max_epochs", 1),
            seed=t.get("seed", 0), ema_decay=t.get("ema_decay", 0.0),
            ckpt_dir=os.path.join(out_dir, "checkpoints"),
            resume=bool(extras.get("ckpt_path")), logger=logger,
            async_ckpt=bool(t.get("async_ckpt", False)),
        )
    else:
        loop.fit_lsgan(
            model, dm, g_lr=t["g_lr"], d_lr=t["d_lr"],
            weight_decay=t["weight_decay"],
            accumulate_grad_batches=t.get("accumulate_grad_batches", 1),
            scheduler=t.get("scheduler"), max_epochs=t.get("max_epochs", 1),
            seed=t.get("seed", 0), ckpt_dir=os.path.join(out_dir, "checkpoints"),
            resume=bool(extras.get("ckpt_path")), logger=logger,
            async_ckpt=bool(t.get("async_ckpt", False)),
        )
    log.info(f"training done -> {out_dir}")


def _load_state_params(model, cfg, ckpt_path: Optional[str],
                       lenient: bool = False):
    """Init params; restore from an Orbax dir or convert a torch .ckpt.

    lenient=False (the predict/eval default) loads strictly — a
    shape-incompatible GAN checkpoint raises instead of silently degrading
    to mostly fresh-init params (ADVICE r1). Pass lenient=True (CLI:
    ckpt.lenient=true) for the reference's fine-tuning semantics
    (LSGAN_module.py:51-61); even then the load hard-fails if most leaves
    were skipped (engine/checkpoint.py::load_params)."""
    import jax

    if cfg["task"] == "sgmse":
        params = model.init_params(jax.random.PRNGKey(0))
        if ckpt_path:
            if ckpt_path.endswith((".ckpt", ".pt", ".pth")):
                from use_tpu.engine.convert_torch import (
                    convert_ncsnpp_state_dict, load_lightning_checkpoint,
                )

                sd = load_lightning_checkpoint(ckpt_path, prefix="Score.score_net.")
                params = convert_ncsnpp_state_dict(sd)
            else:
                from use_tpu.engine.checkpoint import load_params

                params = load_params(ckpt_path, template=params)
        return params
    g_params, _ = model.init_params(jax.random.PRNGKey(0))
    if ckpt_path:
        if ckpt_path.endswith((".ckpt", ".pt", ".pth")):
            from use_tpu.engine.convert_torch import (
                convert_ncsnpp_state_dict, load_lightning_checkpoint,
            )

            sd = load_lightning_checkpoint(ckpt_path, prefix="G.net.")
            g_params = convert_ncsnpp_state_dict(sd)
        else:
            from use_tpu.engine.checkpoint import load_params

            # GAN checkpoints load strictly by default; ckpt.lenient=true
            # restores the reference's shape-tolerant fine-tuning load
            # (LSGAN_module.py:51-61). The per-epoch scheduler already
            # rewrites the optimizer lr from the config on resume (the
            # analog of LSGAN_module.py:157-162).
            g_params = load_params(ckpt_path, template=g_params,
                                   lenient=lenient)
    return g_params


def cmd_predict(experiment: str, overrides: List[str], extras: Dict[str, str]) -> None:
    """Folder -> folder enhancement, mirroring input structure
    (SGMSE_module.predict_step:65-82 / GANModule.predict_step:139-155).

    Hybrid chains (README.md:174-179):
      predict.chain=sgmse+gan  — SGMSE enhances, LSGAN refines the result
      predict.chain=gan+sgmse  — LSGAN output becomes the diffusion prior /
        conditioning (requires an SGMSE config with condition=both|denoised)
    with predict.second_experiment= / predict.second_ckpt= for stage two.
    """
    import jax
    import jax.numpy as jnp

    from use_tpu.data.audio_io import write_wav
    from use_tpu.data.datamodule import LoadWavDataModule
    from use_tpu.data.loadwav import LoadWavConfig

    cfg = load_config(experiment, overrides)
    data_folder = extras.get("predict.data_folder")
    target_folder = extras.get("predict.target_folder")
    if not data_folder or not target_folder:
        raise SystemExit("predict.data_folder= and predict.target_folder= required")

    model = _build_model(cfg)
    params = _load_state_params(
        model, cfg, extras.get("ckpt_path"),
        lenient=extras.get("ckpt.lenient", "").lower() in ("1", "true"),
    )

    chain = extras.get("predict.chain")
    second = second_params = second_cfg = None
    if chain:
        second_cfg = load_config(extras["predict.second_experiment"])
        second = _build_model(second_cfg)
        second_params = _load_state_params(
            second, second_cfg, extras.get("predict.second_ckpt"),
            lenient=extras.get("ckpt.lenient", "").lower() in ("1", "true"),
        )

    dm = LoadWavDataModule(
        LoadWavConfig(data_folder=data_folder, target_folder=target_folder,
                      sampling_rate=cfg["data"].get("sampling_rate", 24000))
    )
    rng = jax.random.PRNGKey(cfg["train"].get("seed", 0))
    icfg = cfg.get("infer", {})

    def run_sgmse(m, p, batch, rng, out_key):
        extra = {k: icfg[k] for k in ("window", "tol") if k in icfg}
        out = m.sample(
            p, batch, rng,
            sampler_type=icfg.get("sampler_type", "pc"), N=icfg.get("N", 50),
            corrector_steps=icfg.get("corrector_steps", 1),
            snr=icfg.get("snr", 0.5), **extra,
        )
        return out, out[out_key]

    n_done = 0
    for batch in dm.predict_dataloader():
        wav = jnp.asarray(batch["perturbed"])
        rng, sub = jax.random.split(rng)
        if chain == "sgmse+gan":
            _, enhanced = run_sgmse(model, params, {"perturbed": wav}, sub, "enhanced")
            out2 = second.enhance(second_params, {"perturbed": enhanced})
            enhanced = np.asarray(out2["fake"])
        elif chain == "gan+sgmse":
            out1 = model.enhance(params, {"perturbed": wav})
            _, enhanced = run_sgmse(
                second, second_params,
                {"perturbed": wav, "fake": out1["fake"]}, sub,
                "fake_sde_enhanced" if second.sde_input == "denoised" else "enhanced",
            )
            enhanced = np.asarray(enhanced)
        elif cfg["task"] == "sgmse":
            _, enhanced = run_sgmse(model, params, {"perturbed": wav}, sub, "enhanced")
            enhanced = np.asarray(enhanced)
        else:
            out = model.enhance(params, {"perturbed": wav})
            enhanced = np.asarray(out["fake"])
        for i, path in enumerate(batch["audio_path"]):
            tgt = path.replace(batch["data_folder"], batch["target_folder"])
            n = int(batch["sample_length"][i])
            write_wav(tgt, enhanced[i][:n], int(batch["sampling_rate"][i]))
            n_done += 1
            log.info(f"wrote {tgt}")
    log.info(f"enhanced {n_done} files -> {target_folder}")


def cmd_eval(experiment: str, overrides: List[str], extras: Dict[str, str]) -> None:
    """Test-set loss evaluation (src/eval.py:38-95 analog)."""
    import jax

    from use_tpu.engine.train import make_sgmse_eval_step
    from use_tpu.engine.state import TrainState
    from use_tpu.engine import optim

    cfg = load_config(experiment, overrides)
    if cfg["task"] != "sgmse":
        raise SystemExit("eval currently supports task=sgmse (reference parity)")
    model = _build_model(cfg)
    params = _load_state_params(
        model, cfg, extras.get("ckpt_path"),
        lenient=extras.get("ckpt.lenient", "").lower() in ("1", "true"),
    )
    tx = optim.adam(params_example=params)
    state = TrainState.create(params, tx)
    dm = _build_datamodule(cfg)
    eval_fn = make_sgmse_eval_step(model)
    rng = jax.random.PRNGKey(0)
    losses = []
    for batch in dm.test_dataloader():
        rng, sub = jax.random.split(rng)
        dev = {k: v for k, v in batch.items() if hasattr(v, "dtype")}
        import jax.numpy as jnp

        dev = {k: jnp.asarray(v) for k, v in dev.items() if np.issubdtype(np.asarray(v).dtype, np.floating)}
        losses.append(float(eval_fn(state, dev, sub)["loss_Score"]))
    log.info(f"test/loss_Score = {float(np.mean(losses)):.5f} over {len(losses)} batches")


def main(argv: Optional[List[str]] = None) -> None:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] not in ("train", "eval", "predict"):
        raise SystemExit(__doc__)
    cmd, rest = argv[0], argv[1:]
    experiment, overrides, extras = _split_args(rest)
    {"train": cmd_train, "eval": cmd_eval, "predict": cmd_predict}[cmd](
        experiment, overrides, extras
    )


if __name__ == "__main__":
    main()
