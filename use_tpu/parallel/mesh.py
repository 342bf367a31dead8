"""Device mesh construction and distributed runtime init.

The reference's only parallelism is Lightning DDP over NCCL
(configs/trainer/ddp.yaml, SURVEY §2.6). The TPU-native equivalent is a
named device mesh: batch sharded over the 'data' axis, parameters replicated
(60M fits one chip) or sharded over an optional 'model' axis when a score
network exceeds a chip. XLA inserts the gradient all-reduces (psum over ICI
intra-slice, DCN across hosts) automatically from the shardings — no
explicit communication code.
"""
from __future__ import annotations

import math
import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from use_tpu.utils.logging import ranked_logger

_log = ranked_logger()


def init_distributed() -> None:
    """Initialize the multi-host JAX runtime when launched under a cluster.

    Single-process (one host, local devices only) is a no-op. Reference
    analog: Lightning's DDP process-group init, done implicitly
    (src/train.py:90 -> trainer.fit). Under a cluster manager (SLURM etc.)
    jax auto-detects process topology; for manual launches — including the
    2-process CPU ddp_sim analog (tests/test_ddp_sim.py, reference
    configs/trainer/ddp_sim.yaml) — set JAX_COORDINATOR_ADDRESS plus
    JAX_NUM_PROCESSES / JAX_PROCESS_ID.
    """
    addr = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if not addr:
        return
    kwargs = {}
    num = os.environ.get("JAX_NUM_PROCESSES")
    pid = os.environ.get("JAX_PROCESS_ID")
    if (num is None) != (pid is None):
        missing = "JAX_PROCESS_ID" if pid is None else "JAX_NUM_PROCESSES"
        raise SystemExit(
            "init_distributed: JAX_NUM_PROCESSES and JAX_PROCESS_ID must be "
            f"set together for a manual multi-process launch; {missing} is "
            "missing"
        )
    if num is not None:
        kwargs = dict(num_processes=int(num), process_id=int(pid))
    jax.distributed.initialize(coordinator_address=addr, **kwargs)


def make_mesh(
    data: Optional[int] = None,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a ('data', 'model') mesh over all (or given) devices.

    data=None uses every remaining device for data parallelism.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        assert n % model == 0, (n, model)
        data = n // model
    assert data * model == n, (data, model, n)
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def default_mesh(
    global_batch: int,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
    on_idle: str = "warn",
) -> Mesh:
    """Mesh for the product training path (the DDP-out-of-the-box analog of
    reference configs/trainer/ddp.yaml:1-10): the data axis is the largest
    device count that divides the global per-step batch, so
    ``python -m use_tpu.cli.main train`` shards over every usable chip with
    no extra flags.

    Devices beyond data*model idle. on_idle='warn' logs (the reference's
    behavior: launching with more GPUs than the batch splits over just
    under-uses them); on_idle='error' — the CLI default — REFUSES when more
    than half the slice would idle, with guidance, because silently training
    a shipping recipe at <=1/2 utilization wastes the slice (VERDICT r3
    item 7)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    usable = n // model
    data = math.gcd(max(int(global_batch), 1), max(usable, 1))
    if data * model < n:
        if on_idle == "error" and data * model < n / 2:
            raise ValueError(
                f"global batch {global_batch} maps onto only {data * model} "
                f"of {n} devices — more than half the slice would idle. "
                "Fix one of: data.batch_size=auto (scales the batch to the "
                "slice: micro_batch_per_device x devices), raise "
                "data.batch_size to a multiple of the device count, or pass "
                "train.mesh_idle=warn to accept the under-use."
            )
        _log.warning(
            "mesh uses %d of %d devices (global batch %d is not divisible "
            "by more); raise data.batch_size to use the full slice",
            data * model, n, global_batch,
        )
    return make_mesh(data=data, model=model, devices=devices[: data * model])


def batch_sharding(mesh: Mesh, leading_accum: bool = False) -> NamedSharding:
    """Sharding for a [B, ...] (or [k, B, ...] with accumulation) batch."""
    spec = P(None, "data") if leading_accum else P("data")
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, leading_accum: bool = False):
    """Device-put a host batch dict with the data axis sharded."""
    sh = batch_sharding(mesh, leading_accum)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def local_batch_to_global(batch, mesh: Mesh, leading_accum: bool = False):
    """Per-host local batch -> global sharded arrays (multi-host input).

    Counterpart of Lightning's per-rank DataLoader + DDP batch split
    (distort_datamodule.py:666-672): each host loads its shard; this stitches
    them into one global jax.Array. With leading_accum the leaves carry a
    leading [accum, B_local, ...] axis and only the batch axis is sharded.
    """
    sh = batch_sharding(mesh, leading_accum)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )


def place_batch(batch, mesh: Optional[Mesh], leading_accum: bool = False):
    """Host batch dict -> device arrays sharded for training on `mesh`.

    The single entry point the engine uses per step: multi-host runs stitch
    per-host shards into global arrays, single-host runs device_put with the
    data axis sharded, mesh=None is the plain single-device path."""
    import jax.numpy as jnp

    if mesh is None:
        return jax.tree.map(jnp.asarray, batch)
    if jax.process_count() > 1:
        return local_batch_to_global(batch, mesh, leading_accum)
    return shard_batch(batch, mesh, leading_accum)
