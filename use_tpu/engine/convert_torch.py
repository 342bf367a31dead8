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


def fold_weight_norm(state_dict: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Fold torch weight_norm reparametrizations: w = g * v / ||v||.

    torch stores `<name>_g` ([O, 1, ...]) and `<name>_v` (the direction);
    the norm is over every dim but 0. Our modules train plain kernels
    (reference GAN/discriminator convs are weight-normed —
    hifigan.py:219-231; the docstring note in
    use_tpu/models/gan/discriminators.py)."""
    out: Dict[str, np.ndarray] = {}
    for key, value in state_dict.items():
        if key.endswith("_g"):
            continue
        if key.endswith("_v"):
            base = key[:-2]
            v = _to_numpy(value)
            g = _to_numpy(state_dict[base + "_g"])
            norm = np.sqrt(
                np.sum(np.square(v.reshape(v.shape[0], -1)), axis=1)
            ).reshape((-1,) + (1,) * (v.ndim - 1))
            out[base] = (g * v / norm).astype(v.dtype)
        else:
            out[key] = _to_numpy(value)
    return out


def convert_period_discriminator_state_dict(
    state_dict: Mapping[str, Any]
) -> Dict[str, Any]:
    """Torch PeriodDiscriminator (hifigan.py:202-267) -> use_tpu params.

    Reference names: convs.{i}.0.weight_{g,v}/bias (weight-normed) and
    conv_post.weight/bias; ours: conv{i} / conv_post with HWIO kernels."""
    folded = fold_weight_norm(state_dict)
    params: Dict[str, Any] = {}
    for key, arr in folded.items():
        parts = key.split(".")
        if parts[0] == "convs":
            name = f"conv{parts[1]}"
        elif parts[0] == "conv_post":
            name = "conv_post"
        else:
            raise KeyError(key)
        leaf, arr = convert_tensor(parts[-1], name, arr)
        _assign(params, [name, leaf], arr)
    return params


def convert_multi_period_discriminator_state_dict(
    state_dict: Mapping[str, Any], periods=(2, 3, 5, 7, 11)
) -> Dict[str, Any]:
    """Torch MultiPeriodDiscriminator (discriminators.{i}.*) -> use_tpu
    MultiPeriodDiscriminator params (period{p} submodules)."""
    by_disc: Dict[str, Dict[str, Any]] = {}
    for key, value in state_dict.items():
        parts = key.split(".", 2)
        assert parts[0] == "discriminators", key
        by_disc.setdefault(parts[1], {})[parts[2]] = value
    params: Dict[str, Any] = {}
    for idx, p in enumerate(periods):
        params[f"period{p}"] = convert_period_discriminator_state_dict(
            by_disc[str(idx)]
        )
    return params


def convert_spec_discriminator_state_dict(
    state_dict: Mapping[str, Any], blocks: int = 3
) -> Dict[str, Any]:
    """Torch SpecDiscriminator (hifigan.py:479-573) -> use_tpu params.

    Reference walks convs.{0..blocks+1}.0 (weight-normed) then conv_post;
    ours names them conv_in / conv{i} / conv_final / conv_post."""
    folded = fold_weight_norm(state_dict)
    name_map = {"0": "conv_in", str(blocks + 1): "conv_final"}
    for i in range(blocks):
        name_map[str(i + 1)] = f"conv{i}"
    params: Dict[str, Any] = {}
    for key, arr in folded.items():
        parts = key.split(".")
        if parts[0] == "convs":
            name = name_map[parts[1]]
        elif parts[0] == "conv_post":
            name = "conv_post"
        elif parts[0] == "window":  # STFT window buffer; rebuilt on our side
            continue
        else:
            raise KeyError(key)
        leaf, arr = convert_tensor(parts[-1], name, arr)
        _assign(params, [name, leaf], arr)
    return params


def convert_multi_spec_discriminator_state_dict(
    state_dict: Mapping[str, Any], n: int = 3
) -> Dict[str, Any]:
    """Torch MultiSpecDiscriminator (discriminators.{i}.*) -> use_tpu params."""
    by_disc: Dict[str, Dict[str, Any]] = {}
    for key, value in state_dict.items():
        parts = key.split(".", 2)
        assert parts[0] == "discriminators", key
        by_disc.setdefault(parts[1], {})[parts[2]] = value
    return {
        f"spec{i}": convert_spec_discriminator_state_dict(by_disc[str(i)])
        for i in range(n)
    }


def convert_scale_discriminator_state_dict(
    state_dict: Mapping[str, Any], n_downsample: int = 5
) -> Dict[str, Any]:
    """Torch ScaleDiscriminator (hifigan.py:303-405) -> use_tpu params.

    Reference walks convs.{0..n+1}.0 (Sequential-wrapped, weight-normed)
    then conv_post; ours names them conv0 / conv{1..n} / conv_pre_post /
    conv_post (use_tpu/models/gan/msd.py)."""
    folded = fold_weight_norm(state_dict)
    name_map = {"0": "conv0", str(n_downsample + 1): "conv_pre_post"}
    for i in range(n_downsample):
        name_map[str(i + 1)] = f"conv{i + 1}"
    params: Dict[str, Any] = {}
    for key, arr in folded.items():
        parts = key.split(".")
        if parts[0] == "convs":
            name = name_map[parts[1]]
        elif parts[0] == "conv_post":
            name = "conv_post"
        else:
            raise KeyError(key)
        leaf, arr = convert_tensor_1d(parts[-1], arr)
        _assign(params, [name, leaf], arr)
    return params


def convert_multi_scale_discriminator_state_dict(
    state_dict: Mapping[str, Any], scales: int = 3
) -> Dict[str, Any]:
    """Torch MultiScaleDiscriminator w/ DWT pooling (hifigan.py:408-477)
    -> use_tpu MultiScaleDiscriminator params (scale{i} + aux_conv{k})."""
    by_disc: Dict[str, Dict[str, Any]] = {}
    aux: Dict[str, Dict[str, Any]] = {}
    for key, value in state_dict.items():
        parts = key.split(".", 2)
        if parts[0] == "discriminators":
            by_disc.setdefault(parts[1], {})[parts[2]] = value
        elif parts[0] == "aux_convs":
            aux.setdefault(parts[1], {})[parts[2]] = value
        else:
            raise KeyError(key)
    params: Dict[str, Any] = {
        f"scale{i}": convert_scale_discriminator_state_dict(by_disc[str(i)])
        for i in range(scales)
    }
    for k, sd in aux.items():
        folded = fold_weight_norm(sd)
        sub: Dict[str, Any] = {}
        for leaf_key, arr in folded.items():
            leaf, arr = convert_tensor_1d(leaf_key, arr)
            _assign(sub, [leaf], arr)
        params[f"aux_conv{k}"] = sub
    return params


def convert_convtasnet_state_dict(
    state_dict: Mapping[str, Any], layer: int = 8, stack: int = 3
) -> Dict[str, Any]:
    """Torch ConvTasNet (reference backbones/convtasnet.py:15-112 +
    convtasnet_utils/utils.py TCN/DepthConv1d) -> use_tpu ConvTasNet params.

    Conv1d [O, I, K] -> [K, I, O]; torch ConvTranspose1d [I, O, K] applies
    the kernel as a transposed conv, which equals flax ConvTranspose with
    the spatial axis flipped: kernel[k, i, o] = W[i, o, K-1-k]. PReLU scalar
    weights map to flax negative_slope. Non-causal (gLN) layout only."""
    depth_leaf = {
        "conv1d": "Conv_0",
        "nonlinearity1": "PReLU_0",
        "reg1": ("_Norm_0", "GroupNorm_0"),
        "dconv1d": "Conv_1",
        "nonlinearity2": "PReLU_1",
        "reg2": ("_Norm_1", "GroupNorm_0"),
        "res_out": "Conv_2",
        "skip_out": "Conv_3",
    }
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        parts = key.split(".")
        if parts[0] == "encoder":
            _assign(params, ["encoder", "kernel"], np.transpose(arr, (2, 1, 0)))
        elif parts[0] == "decoder":
            _assign(
                params, ["decoder", "kernel"],
                np.transpose(arr[:, :, ::-1], (2, 0, 1)).copy(),
            )
        elif parts[:2] == ["TCN", "LN"]:
            leaf = "scale" if parts[-1] == "weight" else "bias"
            _assign(params, ["TCN", "_Norm_0", "GroupNorm_0", leaf], arr)
        elif parts[:2] == ["TCN", "BN"]:
            leaf, arr = convert_tensor_1d(parts[-1], arr)
            _assign(params, ["TCN", "Conv_0", leaf], arr)
        elif parts[:2] == ["TCN", "TCN"]:
            idx = int(parts[2])
            s, i = divmod(idx, layer)
            mapped = depth_leaf[parts[3]]
            sub = [f"tcn_s{s}_l{i}"]
            if isinstance(mapped, tuple):
                sub += list(mapped)
                leaf = "scale" if parts[-1] == "weight" else "bias"
                # torch cLN gain/bias are [1, C, 1]
                _assign(params, ["TCN"] + sub + [leaf], arr.reshape(-1))
                continue
            sub.append(mapped)
            if mapped.startswith("PReLU"):
                _assign(
                    params, ["TCN"] + sub + ["negative_slope"],
                    arr.reshape(()).astype(np.float32),
                )
                continue
            leaf, arr = convert_tensor_1d(parts[-1], arr)
            _assign(params, ["TCN"] + sub + [leaf], arr)
        elif parts[:2] == ["TCN", "output"]:
            if parts[2] == "0":  # PReLU
                _assign(
                    params, ["TCN", "PReLU_0", "negative_slope"],
                    arr.reshape(()).astype(np.float32),
                )
            else:  # 1x1 conv
                leaf, arr = convert_tensor_1d(parts[-1], arr)
                _assign(params, ["TCN", "Conv_1", leaf], arr)
        else:
            raise KeyError(key)
    return params


def convert_tensor_1d(key_leaf: str, arr: np.ndarray):
    """Conv1d weights [O, I, K] -> [K, I, O]; 1-d affine passthrough."""
    if key_leaf == "weight" and arr.ndim == 3:
        return "kernel", np.transpose(arr, (2, 1, 0))
    if key_leaf == "weight":
        return "scale", arr
    assert key_leaf == "bias", key_leaf
    return "bias", arr


def _glfb_map(rest: list) -> list:
    """Torch GLFB sequential indices -> our flax names
    (reference generator5_24k.py:505-541)."""
    block = rest[0]
    if block in ("beta", "gamma"):
        return []  # the leaf itself ('beta'/'gamma' params of the GLFB)
    idx = rest[1]
    if block == "first_block":
        m = {
            "0": ["CumLN2d_0"],
            "1": ["Conv_0"],
            "2": ["CausalConv2d_0", "Conv_0"],
            "4": ["SeChannelModule_0", "CausalConv2d_0", "Conv_0"],
            "5": ["SeFreqModule_0", "CausalConv2d_0", "Conv_0"],
            "6": ["Conv_1"],
        }
        # index 2/4/5 carry a nested .conv(.conv) torch wrapper; drop it
        tail = [p for p in rest[2:-1] if p != "conv"]
        return m[idx] + tail
    assert block == "second_block", rest
    m = {"0": ["CumLN2d_1"], "1": ["Conv_2"], "3": ["Conv_3"]}
    return m[idx] + rest[2:-1]


def _csmgan_leaf(parts: list, arr: np.ndarray):
    leaf = parts[-1]
    if leaf == "weight":
        if arr.ndim == 4:
            return "kernel", np.transpose(arr, (2, 3, 1, 0))
        if arr.ndim == 3:
            return "kernel", np.transpose(arr, (2, 1, 0))
        return "negative_slope", arr.reshape(()).astype(np.float32)  # PReLU
    if leaf in ("gain", "bias", "gamma", "beta"):
        return leaf, arr.reshape(-1) if arr.ndim > 1 else arr
    raise KeyError(".".join(parts))


def convert_csmgan_state_dict(
    state_dict: Mapping[str, Any], upscale: int = 2
) -> Dict[str, Any]:
    """Torch CSMGAN (reference generator5_24k.py:603-688) -> use_tpu params.

    Structure maps mechanically (DownBlock glfb/conv -> enc{i}_glfb{d} +
    down{i}; UpBlock deconv/glfb -> up{i} + dec{i}_glfb{d}; TCN bottleneck
    like ConvTasNet). One real transform: torch's PixelShuffle splits
    channels scale-MINOR (o = nc*scale + s) while ours splits scale-MAJOR
    (o = s*new_c + nc), so the deconv kernel's output axis is permuted."""
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        parts = key.split(".")
        if parts[0] in ("in_proj", "out_proj"):
            path = [parts[0], "Conv_0"]
        elif parts[0] == "encoder":
            i = parts[1]
            if parts[2] == "glfb":
                path = [f"enc{i}_glfb{parts[3]}"] + _glfb_map(parts[4:])
            else:
                assert parts[2] == "conv", key
                path = [f"down{i}"]
        elif parts[0] == "decoder":
            i = parts[1]
            if parts[2] == "deconv":
                path = [f"up{i}", "CausalConv2d_0", "Conv_0"]
            else:
                assert parts[2] == "glfb", key
                path = [f"dec{i}_glfb{parts[3]}"] + _glfb_map(parts[4:])
        elif parts[0] == "bottleneck":
            if parts[1] == "LN":
                path = ["bottleneck", "CumLN1d_0"]
            elif parts[1] == "BN":
                path = ["bottleneck", "Conv_0"]
            elif parts[1] == "TCN":
                sub = {
                    "conv1d": ["Conv_0"], "nonlinearity1": ["PReLU_0"],
                    "reg1": ["CumLN1d_0"], "dconv1d": ["Conv_1"],
                    "nonlinearity2": ["PReLU_1"], "reg2": ["CumLN1d_1"],
                    "res_out": ["Conv_2"], "skip_out": ["Conv_3"],
                }[parts[3]]
                path = ["bottleneck", f"DepthConv1d_{parts[2]}"] + sub
            elif parts[1] == "output":
                path = ["bottleneck", "PReLU_0" if parts[2] == "0" else "Conv_1"]
            else:
                raise KeyError(key)
        else:
            raise KeyError(key)
        leaf, arr = _csmgan_leaf(parts, arr)
        if parts[0] == "decoder" and parts[2] == "deconv" and leaf == "kernel":
            o = arr.shape[-1]
            nc_count = o // upscale
            # ours reads channel o' = s*nc_count + nc where torch wrote
            # o = nc*upscale + s
            gather = np.array(
                [(ou % nc_count) * upscale + (ou // nc_count) for ou in range(o)]
            )
            arr = arr[..., gather]
        _assign(params, path + [leaf], arr)
    return params


def convert_gagnet_state_dict(
    state_dict: Mapping[str, Any], enc_freq: int, enc_ch: int, freqs: int
) -> Dict[str, Any]:
    """Torch GaGNet (reference backbones/gagnet.py:14-185) -> use_tpu params.

    enc_freq/enc_ch: encoder output F'/C (the reference flattens the
    bottleneck features channel-major [C*F'], ours frequency-major [F'*C]);
    freqs = fft_num//2+1 (the reference flattens pre-spectra ri-major
    [2*F], ours frequency-major [F*2]) — both in_conv kernels get their
    input rows permuted accordingly. ConvTranspose2d kernels are spatially
    flipped for flax ConvTranspose (as in convert_convtasnet_state_dict)."""
    c1 = enc_freq * enc_ch

    def in_rows_perm(n_rows: int) -> np.ndarray:
        gather = np.empty(n_rows, np.int64)
        for i in range(c1):
            f, c = divmod(i, enc_ch)
            gather[i] = c * enc_freq + f
        for j in range(n_rows - c1):
            f, ri = divmod(j, 2)
            gather[c1 + j] = c1 + ri * freqs + f
        return gather

    def conv2d(arr):
        return np.transpose(arr, (2, 3, 1, 0))

    def deconv2d(arr):
        return np.transpose(arr[:, :, ::-1, ::-1], (2, 3, 0, 1)).copy()

    def conv1d(arr):
        return np.transpose(arr, (2, 1, 0))

    def leaf_of(parts, arr):
        if parts[-1] == "bias":
            return "bias", arr
        if arr.ndim == 4:
            return "kernel", conv2d(arr)
        if arr.ndim == 3:
            return "kernel", conv1d(arr)
        return "alpha", arr  # PReLU per-channel weight

    def unit_path(seq_idx: str, kind: str):
        # (conv/deconv, NormSwitch, PReLU) sequential triplets
        return {
            "0": [kind], "1": ["NormSwitch_0"], "2": ["PReLUC_0"],
        }[seq_idx]

    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        parts = key.split(".")
        if parts[0] == "en":
            if parts[1] == "meta_unet_list":
                base = ["en", f"u{parts[2]}"]
                rest = parts[3:]
                if rest[0] == "in_conv":
                    if rest[1] == "0":  # GateConv2d: conv.1 is the Conv2d
                        path = base + ["GateConv2d_0", "Conv_0"]
                    elif rest[1] == "1":
                        path = base + ["NormSwitch_0"]
                    else:
                        path = base + ["PReLUC_0"]
                elif rest[0] in ("enco", "deco"):
                    sub = f"{rest[0]}{rest[1]}"
                    seq = rest[3]  # index inside .conv/.deconv Sequential
                    kind = "Conv_0" if rest[0] == "enco" else "ConvTranspose_0"
                    path = base + [sub] + unit_path(seq, kind)
                else:
                    raise KeyError(key)
            elif parts[1] == "last_conv":
                if parts[2] == "0":
                    path = ["en", "last_gate", "Conv_0"]
                elif parts[2] == "1":
                    path = ["en", "NormSwitch_0"]
                else:
                    path = ["en", "PReLUC_0"]
            elif parts[1] == "unet_list":  # plain UNet encoder variant
                i = parts[2]
                if parts[3] == "0":
                    path = ["en", f"gate{i}", "Conv_0"]
                elif parts[3] == "1":
                    path = ["en", f"NormSwitch_{i}"]
                else:
                    path = ["en", f"PReLUC_{i}"]
            else:
                raise KeyError(key)
        elif parts[0] == "gags":
            stage = f"gag{parts[1]}"
            blk = "glance" if parts[2] == "glance_block" else "gaze"
            rest = parts[3:]
            if rest[0] in ("in_conv_main", "in_conv_gate"):
                name = "in_main" if rest[0] == "in_conv_main" else "in_gate"
                path = [stage, blk, name]
                if rest[0] == "in_conv_gate":
                    rest = [rest[0]] + rest[2:]  # drop the Sequential '0'
            elif rest[0].startswith(("tcn_g", "tcm_r", "tcm_i", "tcm_ri")):
                group = {
                    "tcn_g": "tcn", "tcm_r": "tcn_r", "tcm_i": "tcn_i",
                    "tcm_ri": "tcn_ri",
                }[rest[0]]
                a, j = rest[1], rest[3]  # .tcns. in between
                sub = rest[4]
                tcm = [stage, blk, f"{group}{a}", f"tcm{j}"]
                if sub == "in_conv":
                    path = tcm + ["Conv_0"]
                elif sub == "d_conv":
                    path = tcm + {
                        "0": ["PReLUC_0"], "1": ["NormSwitch_0"], "3": ["Conv_1"],
                    }[rest[5]]
                else:
                    assert sub == "out_conv", key
                    path = tcm + {
                        "0": ["PReLUC_1"], "1": ["NormSwitch_1"], "2": ["Conv_2"],
                    }[rest[5]]
            elif rest[0].startswith("linear"):
                name = rest[0].replace("linear_", "linear_")
                path = [stage, blk, name]
            else:
                raise KeyError(key)
        else:
            raise KeyError(key)

        # norm affines use scale/bias names
        if "norm" in parts:
            leaf = "scale" if parts[-1] == "weight" else "bias"
        else:
            leaf, arr = leaf_of(parts, arr)
            if path[-1] == "ConvTranspose_0" and leaf == "kernel":
                arr = deconv2d(_to_numpy(value))
        if path[-1] in ("in_main", "in_gate") and leaf == "kernel":
            arr = arr[:, in_rows_perm(arr.shape[1]), :]
        _assign(params, path + [leaf], arr)
    return params


def convert_wavenet_state_dict(
    state_dict: Mapping[str, Any], layers_per_stack: int
) -> Dict[str, Any]:
    """Torch WaveNet (reference GAN/discriminator/hifigan/open_models.py:
    133-253, the BWE generator core) -> use_tpu WaveNet params."""
    params: Dict[str, Any] = {}
    for key, value in state_dict.items():
        arr = _to_numpy(value)
        parts = key.split(".")
        if parts[0] in ("_conv_in", "_conv_out"):
            path = [parts[0].lstrip("_")]
        else:
            assert parts[0] == "_layers", key
            st, i = divmod(int(parts[1]), layers_per_stack)
            path = [f"layer{st}_{i}", parts[2].lstrip("_")]
        leaf, arr = convert_tensor_1d(parts[-1], arr)
        _assign(params, path + [leaf], arr)
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


def convert_hifigan_generator_state_dict(
    state_dict: Mapping[str, Any], num_kernels: int = 3
) -> Dict[str, Any]:
    """Torch HiFi-GAN Generator (hifigan.py:24-199, causal weight-normed
    convs from layers.py:53-166) -> use_tpu HifiganGenerator params.

    Key map: conv_pre.conv1d -> conv_pre/Conv_0;
    transpose_upsamples.{i}.1.deconv -> transpose_up{i}/ConvTranspose_0
    (torch deconv weight [I, O, K] -> flax kernel [K, I, O] with the
    spatial axis FLIPPED — flax ConvTranspose correlates where torch's
    transposed conv convolves); repeat_upsamples.{i}.2.conv1d ->
    repeat_up{i}/Conv_0; conv_blocks.{i*nk+j}.convs{1,2}.{k}.conv1d ->
    resblock{i}_{j}/conv{1,2}_{k}/Conv_0; conv_post.conv1d ->
    conv_post/Conv_0; source_module.ffn / source_downs.{i} for NSF.
    """
    folded = fold_weight_norm(state_dict)
    params: Dict[str, Any] = {}
    for key, arr in folded.items():
        parts = key.split(".")
        leaf = parts[-1]
        if parts[0] == "conv_pre":
            path = ["conv_pre", "Conv_0"]
        elif parts[0] == "transpose_upsamples":
            path = [f"transpose_up{parts[1]}", "ConvTranspose_0"]
            if leaf == "weight":
                arr = np.transpose(arr[:, :, ::-1], (2, 0, 1))
                _assign(params, path + ["kernel"], arr)
                continue
        elif parts[0] == "repeat_upsamples":
            path = [f"repeat_up{parts[1]}", "Conv_0"]
        elif parts[0] == "conv_blocks":
            idx = int(parts[1])
            i, j = divmod(idx, num_kernels)
            which = parts[2][-1]  # convs1 / convs2
            k = parts[3]
            path = [f"resblock{i}_{j}", f"conv{which}_{k}", "Conv_0"]
        elif parts[0] == "conv_post":
            path = ["conv_post", "Conv_0"]
        elif parts[0] == "source_module":
            path = ["source_module", "ffn"]
        elif parts[0] == "source_downs":
            path = [f"source_down{parts[1]}"]
        else:
            raise KeyError(key)
        leaf, arr = convert_tensor_1d(leaf, arr)
        _assign(params, path + [leaf], arr)
    return params
