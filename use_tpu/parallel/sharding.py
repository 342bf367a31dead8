"""Parameter sharding rules for the optional 'model' (tensor-parallel) axis.

The reference never shards the model (<=60M params). For the BASELINE north
star — "score network sharded over ICI where it exceeds one chip" — we shard
the largest tensors: conv kernels [kh, kw, I, O] and dense kernels [I, O] on
their output axis, biases/norms replicated. XLA's SPMD partitioner then
derives the activation shardings and inserts all-gathers/reduce-scatters
over ICI.
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def param_spec(path: tuple, leaf: Any, min_size: int = 1 << 16) -> P:
    """PartitionSpec for one parameter leaf (output-channel sharding)."""
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    shape = leaf.shape
    if name == "kernel" and leaf.ndim >= 2 and int(np.prod(shape)) >= min_size:
        return P(*((None,) * (leaf.ndim - 1)), "model")
    return P()


def shard_params(params, mesh: Mesh, min_size: int = 1 << 16):
    """Device-put a params pytree with model-axis sharding rules applied."""

    def place(path, leaf):
        spec = param_spec(path, leaf, min_size)
        # output channels must divide the model axis; else replicate
        if spec != P() and leaf.shape[-1] % mesh.shape["model"] != 0:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def params_shardings(params, mesh: Mesh, min_size: int = 1 << 16):
    """The NamedSharding pytree matching shard_params (for jit in_shardings)."""

    def spec_of(path, leaf):
        spec = param_spec(path, leaf, min_size)
        if spec != P() and leaf.shape[-1] % mesh.shape["model"] != 0:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(spec_of, params)
