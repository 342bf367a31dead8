"""Orbax checkpointing: params + optimizer state + EMA + step, top-k by a
monitored metric, save_last, async-friendly for preemptible TPU.

Replaces Lightning ModelCheckpoint (reference configs/callbacks/
model_checkpoint.yaml: top-10 by monitored val metric + save_last,
epoch_{epoch:03d} files) and the ckpt_path resume flow (src/train.py:90).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(
        self,
        directory: str,
        max_to_keep: int = 10,
        monitor: str = "val/loss",
        mode: str = "min",
        async_save: bool = False,
    ):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        # async_save=True returns from save() as soon as the on-device state
        # is snapshotted, with serialization finishing on a background thread
        # (Orbax's async machinery) — the preemptible-TPU pattern: training
        # continues while the write drains; wait()/close() join it. Kept
        # opt-in so single-threaded flows keep strict write-then-read order.
        self.async_save = async_save
        options = ocp.CheckpointManagerOptions(
            max_to_keep=max_to_keep,
            best_fn=(lambda m: m.get(monitor, np.inf)) if monitor else None,
            best_mode=mode,
            create=True,
            enable_async_checkpointing=async_save,
        )
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, metrics: Optional[Dict[str, float]] = None):
        metrics = {k: float(v) for k, v in (metrics or {}).items()}
        self._mgr.save(
            step, args=ocp.args.StandardSave(state), metrics=metrics or None
        )
        if not self.async_save:
            self._mgr.wait_until_finished()

    def wait(self):
        """Join any in-flight async save."""
        self._mgr.wait_until_finished()

    def restore(self, step: Optional[int] = None, template: Any = None) -> Any:
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints in {self.directory}")
        if template is not None:
            return self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return self._mgr.restore(step)

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def best_step(self) -> Optional[int]:
        return self._mgr.best_step()

    def close(self):
        self._mgr.close()


def save_params(path: str, params: Any) -> None:
    """One-shot params save (predict/export flows)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params(
    path: str,
    template: Any = None,
    lenient: bool = False,
    max_skipped_frac: float = 0.5,
) -> Any:
    """Load a params pytree.

    lenient=True restores the raw tree and merges it into `template`
    shape-tolerantly (mismatched or missing leaves keep the template's
    fresh initialization) — the reference's lenient `load_state_dict` used
    for GAN fine-tuning across config changes (LSGAN_module.py:51-61).
    The skipped-leaf report goes through the ranked logger, and the load
    hard-fails if more than `max_skipped_frac` of the template's leaves
    were skipped (a wrong/incompatible checkpoint would otherwise degrade
    silently to mostly fresh-init params); pass max_skipped_frac=1.0 to
    accept any overlap."""
    ckptr = ocp.StandardCheckpointer()
    if lenient:
        assert template is not None, "lenient load needs a template"
        loaded = ckptr.restore(os.path.abspath(path))
        merged, skipped = merge_params_lenient(template, loaded)
        if skipped:
            from use_tpu.utils.logging import ranked_logger

            log = ranked_logger(__name__)
            n_leaves = len(jax.tree_util.tree_leaves(template))
            template_side = [s for s in skipped if "[loaded-only]" not in s]
            log.warning(
                "lenient load of %s skipped %d/%d template leaves "
                "(+%d loaded-only): %s%s",
                path, len(template_side), n_leaves,
                len(skipped) - len(template_side), skipped[:5],
                "..." if len(skipped) > 5 else "",
            )
            if n_leaves and len(template_side) / n_leaves > max_skipped_frac:
                raise ValueError(
                    f"lenient load of {path} skipped "
                    f"{len(template_side)}/{n_leaves} leaves "
                    f"(> {max_skipped_frac:.0%}); this checkpoint does not "
                    f"match the model. Pass max_skipped_frac=1.0 to force."
                )
        return merged
    if template is not None:
        return ckptr.restore(os.path.abspath(path), target=template)
    return ckptr.restore(os.path.abspath(path))


def merge_params_lenient(template: Any, loaded: Any) -> Tuple[Any, list]:
    """Copy leaves of `loaded` into `template` wherever the path exists and
    the shape matches; keep the template leaf otherwise. Returns
    (merged, skipped_paths) where skipped covers BOTH directions — template
    leaves not restored ([missing]/[shape ...]) and checkpoint leaves absent
    from the template ([loaded-only]) — matching the reference's two-way
    report (LSGAN_module.py:59-60)."""
    skipped: list = []

    def walk(tpl, ld, path):
        if isinstance(tpl, dict):
            out = {}
            for k, v in tpl.items():
                if isinstance(ld, dict) and k in ld:
                    out[k] = walk(v, ld[k], path + (k,))
                else:
                    skipped.append("/".join(path + (k,)) + " [missing]")
                    out[k] = v
            if isinstance(ld, dict):
                for k in ld:
                    if k not in tpl:
                        skipped.append(
                            "/".join(path + (k,)) + " [loaded-only]"
                        )
            return out
        if isinstance(ld, dict):
            skipped.append("/".join(path) + " [missing]")
            for k in ld:
                skipped.append("/".join(path + (k,)) + " [loaded-only]")
            return tpl
        shape = getattr(ld, "shape", None)
        if shape is not None and tuple(shape) == tuple(tpl.shape):
            return jax.numpy.asarray(ld, dtype=tpl.dtype)
        skipped.append(
            "/".join(path) + f" [shape {shape} != {tuple(tpl.shape)}]"
        )
        return tpl

    return walk(template, loaded, ()), skipped
