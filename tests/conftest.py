"""Test environment: force CPU with an 8-device virtual mesh.

This is the JAX analog of the reference's configs/trainer/ddp_sim.yaml
(DDP simulated on CPU) — multi-chip sharding is validated on virtual host
devices, matching how the driver dry-runs the multi-chip path.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

# Belt and braces: if some plugin imported jax before this conftest ran, the
# env var above was read too late — force the platform via the config API
# (valid any time before backend initialization).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
