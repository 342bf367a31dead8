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
    "predict.streaming", "predict.chunk_frames",
}
_EVAL_KEYS = {"eval.rich", "eval.max_files"}


def _split_args(argv: List[str]):
    experiment = None
    overrides = []
    extras: Dict[str, str] = {}
    for a in argv:
        if a.startswith("experiment="):
            experiment = a.split("=", 1)[1]
        elif a.startswith(
            ("ckpt_path=", "ckpt.lenient=", "ckpt.use_ema=", "predict.",
             "eval.", "out_dir=")
        ):
            k, v = a.split("=", 1)
            if k.startswith("predict.") and k not in _PREDICT_KEYS:
                raise SystemExit(
                    f"unknown key {k!r}; predict options are "
                    f"{sorted(_PREDICT_KEYS)} (sampler settings go under "
                    f"infer.*, e.g. infer.N=30)"
                )
            if k.startswith("eval.") and k not in _EVAL_KEYS:
                raise SystemExit(
                    f"unknown key {k!r}; eval options are {sorted(_EVAL_KEYS)}"
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
        import use_tpu.models.gan  # noqa: F401 (populate the registries)
        from use_tpu.models.gan import losses
        from use_tpu.models.gan.lsgan import LSGAN
        from use_tpu.models.registry import (
            DiscriminatorRegistry, GeneratorRegistry,
        )

        gcfg = dict(cfg["model"]["generator"])
        # reference: the generator is any _target_ class the GANModule drives
        # uniformly (configs/model/LSGAN.yaml:3-13); select by registry name
        gen_name = gcfg.pop("name", "ncsnpp_wrapper")
        gen = GeneratorRegistry.get_by_name(gen_name)(**gcfg)
        # the LSGAN engine drives G through init_params/target_len/
        # __call__(params, batch, rng, train); bare flax generators in the
        # registry (hifigan_bwe, hifigan_generator) don't implement that
        # interface — fail here with guidance instead of an AttributeError
        # deep inside model init (ADVICE r3)
        missing = [
            a for a in ("init_params", "target_len") if not hasattr(gen, a)
        ]
        if missing:
            raise SystemExit(
                f"model.generator.name={gen_name} resolves "
                f"{type(gen).__name__}, which lacks the LSGAN generator "
                f"interface ({', '.join(missing)}); usable generators for "
                "the GAN task are ncsnpp_wrapper and csmgan"
            )
        disc = DiscriminatorRegistry.get_by_name(cfg["model"]["discriminator"])()
        lcfg = losses.HifiganGLossConfig(
            **cfg["model"]["g_loss"], enhanced_key=cfg["model"].get("enhanced_key", "fake")
        )
        return LSGAN(generator=gen, discriminator=disc, g_loss_cfg=lcfg)
    raise SystemExit(f"unknown task {cfg['task']}")


def resolve_auto_batch(cfg: Dict, n_devices: int) -> None:
    """Slice-aware recipe resolution (VERDICT r3 item 7), in place:

      data.batch_size: auto      -> micro_batch_per_device x n_devices
                                    (the global batch scales with the slice,
                                    keeping per-device work constant)
      train.accumulate_grad_batches: auto
                                 -> max(1, train.effective_batch // batch)
                                    (accumulation shrinks as the slice grows,
                                    holding the effective batch at the
                                    recipe's target where divisible)

    The reference couples global batch to world size by division
    (distort_datamodule.py:666-672); a TPU-first recipe scales the other way.
    """
    d, t = cfg["data"], cfg["train"]
    if d.get("batch_size") == "auto":
        micro = int(d.get("micro_batch_per_device", 1))
        d["batch_size"] = micro * n_devices
    if t.get("accumulate_grad_batches") == "auto":
        eff = int(t.get("effective_batch", d.get("batch_size", 4)))
        t["accumulate_grad_batches"] = max(1, eff // int(d["batch_size"]))


def _build_datamodule(cfg: Dict):
    from use_tpu.data.datamodule import DistortDataModule
    from use_tpu.data.distort_dataset import DistortConfig

    import jax

    resolve_auto_batch(cfg, jax.device_count())
    d = dict(cfg["data"])
    batch_size = d.pop("batch_size", 4)
    num_workers = d.pop("num_workers", 4)
    overfit_items = d.pop("overfit_items", None)
    known = set(DistortConfig.__dataclass_fields__)
    dcfg = DistortConfig(**{k: v for k, v in d.items() if k in known})
    return DistortDataModule(
        train_cfg=dcfg, batch_size=batch_size, num_workers=num_workers,
        seed=cfg["train"].get("seed", 0), world_size=jax.process_count(),
        process_index=jax.process_index(), overfit_items=overfit_items,
    )


def _test_split_means(model, cfg, state, dm) -> Dict[str, float]:
    """Mean metrics of the test distortion split under `state` (the body of
    reference trainer.test, src/eval.py:75 / SGMSE_module.test_step:61-63)."""
    import jax
    import jax.numpy as jnp

    from use_tpu.engine.train import make_gan_eval_step, make_sgmse_eval_step

    def floats(batch):
        return {
            k: jnp.asarray(v) for k, v in batch.items()
            if hasattr(v, "dtype")
            and np.issubdtype(np.asarray(v).dtype, np.floating)
        }

    rng = jax.random.PRNGKey(0)
    rows = []
    if cfg["task"] == "sgmse":
        eval_fn = make_sgmse_eval_step(model)
        for batch in dm.test_dataloader():
            rng, sub = jax.random.split(rng)
            rows.append({"loss_Score": float(
                eval_fn(state, floats(batch), sub)["loss_Score"]
            )})
    else:
        eval_fn = make_gan_eval_step(model)
        for batch in dm.test_dataloader():
            rows.append(
                {k: float(v) for k, v in eval_fn(state, floats(batch)).items()}
            )
    return {
        f"test/{k}": float(np.mean([r[k] for r in rows]))
        for k in (rows[0] if rows else {})
    }


def _test_after_fit(model, cfg, dm, out_dir: str, history: List[Dict],
                    logger: MetricLogger) -> None:
    """Reload the BEST checkpoint after fit, test it, and persist the
    optimized metric for sweeps (reference src/train.py:90-108: trainer.test
    on best_model_path + get_metric_value). The persisted value is the best
    checkpoint's monitored metric — a trial whose final epoch regressed
    still reports its best, and the test/* row comes from that same best
    state, not the last epoch's. Runs on process 0 only (matching
    MetricLogger's rank gating): in a multi-host launch every rank would
    otherwise compute means over its local data shard and race writing the
    same optimized_metric.json."""
    import jax

    if jax.process_index() != 0:
        return
    from use_tpu.engine.checkpoint import CheckpointManager

    monitor = "val/loss_Score" if cfg["task"] == "sgmse" else "val/loss_G"
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    mgr = CheckpointManager(ckpt_dir, monitor=monitor)
    best = mgr.best_step()
    if best is None:
        best = mgr.latest_step()
    mgr.close()
    if best is None:
        log.warning("no checkpoint to test after fit")
        return
    state = _restore_train_state(ckpt_dir, cfg, model, step=int(best))
    means = _test_split_means(model, cfg, state, dm)
    logger.log({"step": int(best), **means})

    best_rows = [h for h in history if h.get("epoch") == int(best)]
    best_val = best_rows[-1].get(monitor) if best_rows else None
    explicit = "optimized_metric" in cfg["train"]
    metric_name = cfg["train"].get("optimized_metric", monitor)
    candidates = dict(means)
    if best_val is not None and np.isfinite(best_val):
        candidates[monitor] = float(best_val)
    if metric_name not in candidates:
        if explicit or not candidates:
            raise SystemExit(
                f"train.optimized_metric={metric_name!r} not found; "
                f"available: {sorted(candidates)}"
            )
        metric_name = sorted(candidates)[0]  # e.g. val never ran
    record = {
        "metric": metric_name,
        "value": float(candidates[metric_name]),
        "best_epoch": int(best),
        "monitor": {monitor: best_val},
        "test": means,
    }
    import json

    with open(os.path.join(out_dir, "optimized_metric.json"), "w") as f:
        json.dump(record, f, indent=2)
    log.info(
        f"test-after-fit @ epoch {best}: "
        + " ".join(f"{k}={v:.5f}" for k, v in means.items())
        + f"; optimized {metric_name}={record['value']:.5g}"
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
        result = loop.fit_sgmse(
            model, dm, lr=t["lr"], weight_decay=t["weight_decay"],
            grad_clip=t.get("grad_clip", 100.0),
            accumulate_grad_batches=t.get("accumulate_grad_batches", 1),
            scheduler=t.get("scheduler"), max_epochs=t.get("max_epochs", 1),
            seed=t.get("seed", 0), ema_decay=t.get("ema_decay", 0.0),
            ckpt_dir=os.path.join(out_dir, "checkpoints"),
            resume=bool(extras.get("ckpt_path")), logger=logger,
            async_ckpt=bool(t.get("async_ckpt", False)),
            rich_eval_every=t.get("rich_eval_every"),
            rich_eval_files=t.get("rich_eval_files", 2),
            rich_eval_N=t.get("rich_eval_N", 10),
            mesh_idle=t.get("mesh_idle", "error"),
        )
    else:
        result = loop.fit_lsgan(
            model, dm, g_lr=t["g_lr"], d_lr=t["d_lr"],
            weight_decay=t["weight_decay"],
            accumulate_grad_batches=t.get("accumulate_grad_batches", 1),
            scheduler=t.get("scheduler"), max_epochs=t.get("max_epochs", 1),
            seed=t.get("seed", 0), ckpt_dir=os.path.join(out_dir, "checkpoints"),
            resume=bool(extras.get("ckpt_path")), logger=logger,
            async_ckpt=bool(t.get("async_ckpt", False)),
            mesh_idle=t.get("mesh_idle", "error"),
        )
    _test_after_fit(model, cfg, dm, out_dir, result.history, logger)
    log.info(f"training done -> {out_dir}")


def _is_manager_dir(path: str) -> bool:
    """True for a CheckpointManager directory (numeric step subdirs)."""
    return os.path.isdir(path) and any(
        d.isdigit() for d in os.listdir(path)
    )


def _restore_train_state(ckpt_path: str, cfg, model, step: Optional[int] = None):
    """Restore a full training checkpoint (CheckpointManager layout) into a
    TrainState / GANTrainState template built from the experiment config.
    step=None restores the latest; pass a step to pick e.g. the best."""
    import jax

    from use_tpu.engine import optim
    from use_tpu.engine.checkpoint import CheckpointManager
    from use_tpu.engine.state import GANTrainState, TrainState

    t = cfg["train"]
    if cfg["task"] == "sgmse":
        params = model.init_params(jax.random.PRNGKey(0))
        tx = optim.adam(
            t.get("lr", 5e-4), t.get("weight_decay", 1e-7),
            grad_clip=t.get("grad_clip", 100.0), params_example=params,
        )
        template = TrainState.create(params, tx, ema_decay=t.get("ema_decay", 0.0))
    else:
        g_params, d_params = model.init_params(jax.random.PRNGKey(0))
        g_tx = optim.adam(t.get("g_lr", 5e-4), t.get("weight_decay", 1e-7),
                          params_example=g_params)
        d_tx = optim.adam(t.get("d_lr", 2e-4), t.get("weight_decay", 1e-7),
                          params_example=d_params)
        template = GANTrainState(
            g=TrainState.create(g_params, g_tx),
            d=TrainState.create(d_params, d_tx),
        )
    mgr = CheckpointManager(ckpt_path)
    state = mgr.restore(step=step, template=template)
    mgr.close()
    return state


def _load_state_params(model, cfg, ckpt_path: Optional[str],
                       lenient: bool = False, use_ema: bool = False):
    """Init params; restore from an Orbax dir (params-only or a full
    CheckpointManager training directory) or convert a torch .ckpt.

    Returns params for task=sgmse and (g_params, d_params_or_None) for
    task=lsgan (d_params only available from training checkpoints).

    use_ema=True (CLI: ckpt.use_ema=true) selects state.ema_params from a
    training checkpoint — the legacy path's EMA-swap-at-eval semantics
    (reference sgmse/model.py:123-139). Requires the run to have trained
    with ema_decay>0.

    lenient=False (the predict/eval default) loads strictly — a
    shape-incompatible GAN checkpoint raises instead of silently degrading
    to mostly fresh-init params (ADVICE r1). Pass lenient=True (CLI:
    ckpt.lenient=true) for the reference's fine-tuning semantics
    (LSGAN_module.py:51-61); even then the load hard-fails if most leaves
    were skipped (engine/checkpoint.py::load_params)."""
    import jax

    def pick(train_state):
        if use_ema:
            if train_state.ema_params is None:
                raise SystemExit(
                    "ckpt.use_ema=true but the checkpoint has no EMA params "
                    "(train with train.ema_decay > 0)"
                )
            return train_state.ema_params
        return train_state.params

    if cfg["task"] == "sgmse":
        params = model.init_params(jax.random.PRNGKey(0))
        if ckpt_path:
            if ckpt_path.endswith((".ckpt", ".pt", ".pth")):
                from use_tpu.engine.convert_torch import (
                    convert_ncsnpp_state_dict, load_lightning_checkpoint,
                )

                sd = load_lightning_checkpoint(ckpt_path, prefix="Score.score_net.")
                params = convert_ncsnpp_state_dict(sd)
            elif _is_manager_dir(ckpt_path):
                params = pick(_restore_train_state(ckpt_path, cfg, model))
            else:
                from use_tpu.engine.checkpoint import load_params

                params = load_params(ckpt_path, template=params)
        elif use_ema:
            raise SystemExit("ckpt.use_ema=true requires ckpt_path=")
        return params
    g_params, _ = model.init_params(jax.random.PRNGKey(0))
    d_params = None
    if ckpt_path:
        if ckpt_path.endswith((".ckpt", ".pt", ".pth")):
            from use_tpu.engine.convert_torch import (
                convert_ncsnpp_state_dict, load_lightning_checkpoint,
            )

            sd = load_lightning_checkpoint(ckpt_path, prefix="G.net.")
            g_params = convert_ncsnpp_state_dict(sd)
        elif _is_manager_dir(ckpt_path):
            state = _restore_train_state(ckpt_path, cfg, model)
            g_params, d_params = pick(state.g), state.d.params
        else:
            from use_tpu.engine.checkpoint import load_params

            # GAN checkpoints load strictly by default; ckpt.lenient=true
            # restores the reference's shape-tolerant fine-tuning load
            # (LSGAN_module.py:51-61). The per-epoch scheduler already
            # rewrites the optimizer lr from the config on resume (the
            # analog of LSGAN_module.py:157-162).
            g_params = load_params(ckpt_path, template=g_params,
                                   lenient=lenient)
    return g_params, d_params


def cmd_predict(experiment: str, overrides: List[str], extras: Dict[str, str]) -> None:
    """Folder -> folder enhancement, mirroring input structure
    (SGMSE_module.predict_step:65-82 / GANModule.predict_step:139-155).

    Hybrid chains (README.md:174-179):
      predict.chain=sgmse+gan  — SGMSE enhances, LSGAN refines the result
      predict.chain=gan+sgmse  — LSGAN output becomes the diffusion prior /
        conditioning (requires an SGMSE config with condition=both|denoised)
    with predict.second_experiment= / predict.second_ckpt= for stage two.
    Overrides prefixed `second.` apply to the second experiment's config
    (e.g. second.model.condition=both second.model.sde_input=denoised).
    """
    import jax
    import jax.numpy as jnp

    from use_tpu.data.audio_io import write_wav
    from use_tpu.data.datamodule import LoadWavDataModule
    from use_tpu.data.loadwav import LoadWavConfig

    second_overrides = [o[len("second."):] for o in overrides
                        if o.startswith("second.")]
    overrides = [o for o in overrides if not o.startswith("second.")]
    cfg = load_config(experiment, overrides)
    data_folder = extras.get("predict.data_folder")
    target_folder = extras.get("predict.target_folder")
    if not data_folder or not target_folder:
        raise SystemExit("predict.data_folder= and predict.target_folder= required")

    lenient = extras.get("ckpt.lenient", "").lower() in ("1", "true")
    use_ema = extras.get("ckpt.use_ema", "").lower() in ("1", "true")

    def infer_params(m, c, path):
        loaded = _load_state_params(m, c, path, lenient=lenient, use_ema=use_ema)
        return loaded[0] if c["task"] == "lsgan" else loaded

    model = _build_model(cfg)
    params = infer_params(model, cfg, extras.get("ckpt_path"))

    chain = extras.get("predict.chain")
    second = second_params = second_cfg = None
    if chain:
        second_cfg = load_config(
            extras["predict.second_experiment"], second_overrides
        )
        second = _build_model(second_cfg)
        second_params = infer_params(
            second, second_cfg, extras.get("predict.second_ckpt")
        )

    dm = LoadWavDataModule(
        LoadWavConfig(data_folder=data_folder, target_folder=target_folder,
                      sampling_rate=cfg["data"].get("sampling_rate", 24000))
    )
    rng = jax.random.PRNGKey(cfg["train"].get("seed", 0))
    icfg = cfg.get("infer", {})

    # chunked streaming enhancement (task=lsgan with a streamable generator,
    # e.g. model.generator.name=csmgan): predict.streaming=true
    # [predict.chunk_frames=4]
    streaming = extras.get("predict.streaming", "").lower() in ("1", "true")
    stream_chunk = int(extras.get("predict.chunk_frames", "4"))
    stream_sess = None
    if streaming:
        if chain or cfg["task"] != "lsgan" or not hasattr(
            getattr(model, "generator", None), "enhance_streaming"
        ):
            raise SystemExit(
                "predict.streaming=true requires task=lsgan with a "
                "streamable generator (model.generator.name=csmgan) and no "
                "predict.chain"
            )
        # validate the stream-framing constraints up front instead of a raw
        # ValueError/NotImplementedError from the CSMGANStream constructor
        # mid-file-loop (ADVICE r3)
        if stream_chunk < 2:
            raise SystemExit(
                f"predict.chunk_frames={stream_chunk} invalid: streaming "
                "needs >= 2 frames per chunk (the first chunk primes the "
                "centered-STFT reflection)"
            )
        feat = model.generator.feature
        if feat.cfg.wl != feat.n_fft or feat.n_fft != 2 * feat.hop_length:
            raise SystemExit(
                "predict.streaming=true requires the generator front-end to "
                "satisfy win_length == n_fft == 2*hop (got n_fft="
                f"{feat.n_fft}, win_length={feat.cfg.wl}, "
                f"hop={feat.hop_length}); use the csmgan defaults or adjust "
                "model.generator.* overrides"
            )

    def run_sgmse(m, p, batch, rng, out_key):
        extra = {k: icfg[k] for k in ("window", "tol") if k in icfg}
        kw = dict(
            sampler_type=icfg.get("sampler_type", "pc"), N=icfg.get("N", 50),
            corrector_steps=icfg.get("corrector_steps", 1),
            snr=icfg.get("snr", 0.5), **extra,
        )
        # single-utterance latency default: overlapped chunk-8 sampling
        # rides the efficient batch-8 MXU path (1.71x vs full-clip batch-1,
        # scripts/bench_batch1.py; quality-gated in tests/test_learning.py).
        # infer.chunks=1 disables (reference-exact full-clip sampling);
        # hybrid conditioning ('fake') and clips under 5 s run full-clip.
        chunks = int(icfg.get("chunks", 8))
        sr = int(cfg["data"].get("sampling_rate", 24000))
        wav_in = batch["perturbed"]
        if (chunks > 1 and wav_in.shape[0] == 1 and "fake" not in batch
                and kw["sampler_type"] == "pc"
                and wav_in.shape[-1] >= 5 * sr):
            out = m.sample_chunked(
                p, batch, rng, n_chunks=chunks,
                overlap_frames=int(icfg.get("chunk_overlap_frames", 32)), **kw
            )
        else:
            out = m.sample(p, batch, rng, **kw)
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
        elif streaming:
            enhanced, stream_sess = model.generator.enhance_streaming(
                params, wav, chunk_frames=stream_chunk, session=stream_sess
            )
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
    """Test-set evaluation for ANY task (src/eval.py:38-95 — trainer.test
    runs whichever module the config names):

      task=sgmse -> score-matching loss over the test distortion set
      task=lsgan -> G forward + full criterion losses (test_step:130-137)

    plus the rich metric harness (reference runs it per val epoch,
    sgmse/util/inference.py:23-101): enhance eval.max_files test utterances,
    compute SI-SDR/SI-SIR/SI-SAR/LSD (+PESQ/ESTOI when installed), and log
    TB audio + spectrogram figures. Disable with eval.rich=false."""
    import jax
    import jax.numpy as jnp

    from use_tpu.engine import optim
    from use_tpu.engine.evaluate import evaluate_model
    from use_tpu.engine.state import GANTrainState, TrainState
    from use_tpu.engine.train import make_gan_eval_step, make_sgmse_eval_step

    cfg = load_config(experiment, overrides)
    model = _build_model(cfg)
    lenient = extras.get("ckpt.lenient", "").lower() in ("1", "true")
    use_ema = extras.get("ckpt.use_ema", "").lower() in ("1", "true")
    loaded = _load_state_params(
        model, cfg, extras.get("ckpt_path"), lenient=lenient, use_ema=use_ema
    )
    out_dir = extras.get(
        "out_dir", os.path.join("runs", experiment + "_eval",
                                time.strftime("%Y%m%d-%H%M%S"))
    )
    logger = MetricLogger(
        csv_path=os.path.join(out_dir, "metrics.csv"),
        tensorboard_dir=os.path.join(out_dir, "tb"),
    )
    dm = _build_datamodule(cfg)
    rng = jax.random.PRNGKey(0)

    def floats(batch):
        return {
            k: jnp.asarray(v) for k, v in batch.items()
            if hasattr(v, "dtype")
            and np.issubdtype(np.asarray(v).dtype, np.floating)
        }

    rows = []
    if cfg["task"] == "sgmse":
        params = loaded
        state = TrainState.create(params, optim.adam(params_example=params))
        eval_fn = make_sgmse_eval_step(model)
        for batch in dm.test_dataloader():
            rng, sub = jax.random.split(rng)
            rows.append({"loss_Score": float(
                eval_fn(state, floats(batch), sub)["loss_Score"]
            )})
    else:
        g_params, d_params = loaded
        if d_params is None:  # params-only ckpt: score vs a fresh-init D
            _, d_params = model.init_params(jax.random.PRNGKey(0))
            log.warning(
                "no discriminator in checkpoint; adversarial/feature terms "
                "use a fresh-init D (reconstruction losses are unaffected)"
            )
        g_tx = optim.adam(params_example=g_params)
        d_tx = optim.adam(params_example=d_params)
        state = GANTrainState(
            g=TrainState.create(g_params, g_tx),
            d=TrainState.create(d_params, d_tx),
        )
        eval_fn = make_gan_eval_step(model)
        for batch in dm.test_dataloader():
            rows.append(
                {k: float(v) for k, v in eval_fn(state, floats(batch)).items()}
            )

    means = {
        f"test/{k}": float(np.mean([r[k] for r in rows]))
        for k in (rows[0] if rows else {})
    }
    logger.log({"step": 0, **means})

    # -- rich metric harness (inference.py:23-101) -------------------------
    if extras.get("eval.rich", "true").lower() not in ("0", "false"):
        max_files = int(extras.get("eval.max_files", 4))
        icfg = cfg.get("infer", {})
        pairs = []
        for batch in dm.test_dataloader():
            for i in range(len(batch["clean"])):
                pairs.append({
                    "clean": np.asarray(batch["clean"][i]),
                    "perturbed": np.asarray(batch["perturbed"][i]),
                })
                if len(pairs) >= max_files:
                    break
            if len(pairs) >= max_files:
                break

        if cfg["task"] == "sgmse":
            def enhance_fn(noisy, sub):
                out = model.sample(
                    state.params, {"perturbed": noisy[None]}, sub,
                    sampler_type=icfg.get("sampler_type", "pc"),
                    N=icfg.get("N", 50),
                    corrector_steps=icfg.get("corrector_steps", 1),
                    snr=icfg.get("snr", 0.5),
                )
                return np.asarray(out["enhanced"])[0]
        else:
            def enhance_fn(noisy, sub):
                out = model.enhance(state.g.params, {"perturbed": noisy[None]})
                return np.asarray(out["fake"])[0]

        result = evaluate_model(
            enhance_fn, pairs, rng,
            sr=cfg["data"].get("sampling_rate", 24000),
        )
        logger.log({"step": 0, **{f"test/{k}": v
                                  for k, v in result["metrics"].items()}})
        sr = cfg["data"].get("sampling_rate", 24000)
        for i, fig in enumerate(result["figures"]):
            logger.log_figure(f"eval/example_{i}", fig, step=0)
        for i, clips in enumerate(result["audio"]):
            for name, wav in clips.items():
                logger.log_audio(f"eval/{name}_{i}", wav, sr, step=0)
    logger.close()
    log.info(
        "eval done: " + " ".join(f"{k}={v:.5f}" for k, v in means.items())
        + f" over {len(rows)} batches -> {out_dir}"
    )


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
