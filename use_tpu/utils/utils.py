"""Task utilities: crash-safe wrappers, config printing, profiling hooks.

Reference parity: src/utils/utils.py:12-119 (extras, task_wrapper,
get_metric_value), src/utils/rich_utils.py (config tree printing) and the
profiler presets (configs/debug/profiler.yaml) mapped to jax.profiler.
"""
from __future__ import annotations

import contextlib
import time
import warnings
from typing import Any, Callable, Dict, Optional

from use_tpu.utils.logging import ranked_logger

log = ranked_logger()


def extras(cfg: Dict) -> None:
    """Pre-task housekeeping (utils.py:12-40): warning suppression and a
    config pretty-print."""
    if cfg.get("ignore_warnings"):
        warnings.filterwarnings("ignore")
    if cfg.get("print_config", True):
        print_config_tree(cfg)


def print_config_tree(cfg: Dict, indent: int = 0) -> None:
    """Plain-text config tree (rich_utils.print_config_tree analog)."""
    for key, value in cfg.items():
        if isinstance(value, dict):
            log.info("  " * indent + f"{key}:")
            print_config_tree(value, indent + 1)
        else:
            log.info("  " * indent + f"{key}: {value}")


def enforce_tags(cfg: Dict, save_to: Optional[str] = None) -> None:
    """Require experiment tags (rich_utils.py:78 analog).

    The reference prompts interactively when tags are missing; here we
    default to ['dev'] (non-interactive engines) and warn. Optionally
    appends the tags to a file for run bookkeeping.
    """
    if not cfg.get("tags"):
        cfg["tags"] = ["dev"]
        log.warning("no tags provided in config — defaulting to ['dev']")
    if save_to:
        with open(save_to, "a") as f:
            f.write(" ".join(map(str, cfg["tags"])) + "\n")


def task_wrapper(task_func: Callable) -> Callable:
    """Crash-safe task execution (utils.py:43-95): log the exception, flush
    loggers, re-raise; always report the output dir / elapsed time."""

    def wrap(*args, **kwargs):
        t0 = time.time()
        try:
            return task_func(*args, **kwargs)
        except Exception:
            log.exception("task failed")
            raise
        finally:
            log.info(f"task '{task_func.__name__}' finished in {time.time() - t0:.1f}s")

    return wrap


def get_metric_value(metric_dict: Dict[str, Any], metric_name: Optional[str]) -> Optional[float]:
    """Retrieve an optimized metric for sweeps (utils.py:98-119)."""
    if not metric_name:
        return None
    if metric_name not in metric_dict:
        raise KeyError(
            f"Metric '{metric_name}' not found. Available: {sorted(metric_dict)}"
        )
    return float(metric_dict[metric_name])


@contextlib.contextmanager
def profiler(trace_dir: Optional[str] = None):
    """jax.profiler trace context (the TPU analog of Lightning's profiler
    presets; view with TensorBoard's profile plugin / Perfetto)."""
    import jax

    if trace_dir is None:
        yield
        return
    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        log.info(f"profiler trace written to {trace_dir}")


def rtf(wall_seconds: float, audio_samples: int, sr: int) -> float:
    """Real-time factor: wall / audio duration (model.py:396-400)."""
    return wall_seconds / (audio_samples / sr)
