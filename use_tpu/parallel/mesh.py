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

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_distributed() -> None:
    """Initialize the multi-host JAX runtime when launched under a cluster.

    Single-process (one host, local devices only) is a no-op. Reference
    analog: Lightning's DDP process-group init, done implicitly
    (src/train.py:90 -> trainer.fit).
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    ):
        jax.distributed.initialize()


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


def local_batch_to_global(batch, mesh: Mesh):
    """Per-host local batch -> global sharded arrays (multi-host input).

    Counterpart of Lightning's per-rank DataLoader + DDP batch split
    (distort_datamodule.py:666-672): each host loads its shard; this stitches
    them into one global jax.Array.
    """
    sh = batch_sharding(mesh)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(sh, np.asarray(x)), batch
    )
