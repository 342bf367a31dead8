"""Conditional-skip test decorator (reference tests/helpers/run_if.py:28-142).

The reference carries a Lightning-template ``RunIf(min_gpus=..., tpu=...)``
marker; this is the JAX-native equivalent: skip unless the requested
accelerator/device count/package is available. Like the reference's, it is
available for hardware-gated tests without forcing them to exist.

Usage::

    @RunIf(tpu=True)
    def test_only_on_tpu(): ...

    @RunIf(min_devices=8)
    def test_needs_mesh(): ...
"""
from __future__ import annotations

import importlib.util

import pytest


def package_available(name: str) -> bool:
    """True if ``import name`` would succeed (reference
    tests/helpers/package_available.py:20)."""
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ModuleNotFoundError, ValueError):
        return False


def _backend_available(platform: str) -> bool:
    import jax

    try:
        return len(jax.devices(platform)) > 0
    except RuntimeError:
        return False


def RunIf(
    *,
    tpu: bool = False,
    gpu: bool = False,
    min_devices: int = 0,
    requires: tuple = (),
    **_ignored,
):
    """Return a pytest.mark.skipif combining all the given conditions."""
    import jax

    conditions = []
    reasons = []
    if tpu:
        conditions.append(not _backend_available("tpu"))
        reasons.append("requires a TPU backend")
    if gpu:
        conditions.append(not _backend_available("gpu"))
        reasons.append("requires a GPU backend")
    if min_devices:
        conditions.append(jax.device_count() < min_devices)
        reasons.append(f"requires >= {min_devices} devices")
    for pkg in requires:
        conditions.append(not package_available(pkg))
        reasons.append(f"requires package {pkg!r}")

    return pytest.mark.skipif(
        any(conditions), reason="; ".join(reasons) or "condition not met"
    )
