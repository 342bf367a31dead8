"""PyTorch checkpoint -> Flax params converter.

Enables loading reference-trained NCSN++ / SGMSE / LSGAN checkpoints
(distributed via HuggingFace, reference README.md:169-171) into this
framework, and is the basis of the numerical parity gate (mel-allclose vs
the reference's outputs).

The reference NCSN++ keeps its layers in a flat ``all_modules`` ModuleList
whose meaning is defined by the forward-pass walk order (reference
ncsnpp.py:316, 329-491). Our Flax module names its submodules ``m{i}`` in
that same walk order, so conversion is a mechanical re-keying plus the
standard torch->flax tensor transpositions:

    conv  weight [O, I, kh, kw] -> kernel [kh, kw, I, O]
    dense weight [O, I]         -> kernel [I, O]
    norm  weight/bias           -> scale / bias
    NIN/GFP W, b                -> unchanged
"""
from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _to_numpy(t) -> np.ndarray:
    try:
        return t.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(t)


def _assign(tree: Dict[str, Any], path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def convert_tensor(key_leaf: str, prev_leaf: str, arr: np.ndarray):
    """Map one torch tensor to (flax_leaf_name, transposed_array)."""
    if key_leaf == "weight":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            return "kernel", np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 2:  # dense [out, in] -> [in, out]
            return "kernel", np.transpose(arr, (1, 0))
        if arr.ndim == 1:  # (group)norm affine
            return "scale", arr
        raise ValueError(f"unhandled weight rank {arr.ndim} for {prev_leaf}")
    if key_leaf == "bias":
        return "bias", arr
    if key_leaf in ("W", "b"):  # NIN / GaussianFourierProjection
        return key_leaf, arr
    raise ValueError(f"unhandled leaf {key_leaf}")


def convert_ncsnpp_state_dict(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """Torch NCSNpp state_dict -> flax params dict for use_tpu NCSNpp."""
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        parts = key.split(".")
        if parts[0] == "all_modules":
            parts = [f"m{parts[1]}"] + parts[2:]
        # Upsample/Downsample FIR conv params are flat in our module
        if len(parts) >= 3 and parts[-2] == "Conv2d_0":
            leaf, arr = convert_tensor(parts[-1], parts[-2], arr)
            if leaf == "kernel":
                _assign(params, parts[:-2] + ["Conv2d_0_weight"], arr)
            else:
                _assign(params, parts[:-2] + ["Conv2d_0_bias"], arr)
            continue
        leaf, arr = convert_tensor(parts[-1], parts[-2] if len(parts) > 1 else "", arr)
        _assign(params, parts[:-1] + [leaf], arr)
    return params


def load_lightning_checkpoint(path: str, prefix: str) -> Dict[str, np.ndarray]:
    """Load a Lightning .ckpt and extract a sub-module state_dict by prefix.

    E.g. prefix='Score.score_net.' for SGMSEModule checkpoints or
    'G.model.' for LSGAN generator checkpoints.
    """
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt.get("state_dict", ckpt)
    out = {}
    for k, v in state.items():
        if k.startswith(prefix):
            out[k[len(prefix):]] = v
    if not out:
        raise KeyError(
            f"prefix {prefix!r} matched nothing; available roots: "
            f"{sorted({k.split('.')[0] for k in state})}"
        )
    return out
