"""Checkpoint interop with the reference's torch `.pth` format.

The reference saves `torch.save({'epoch', 'model', 'performance/psnr',
'state_dict', 'optimizer'})` with the (unwrapped) module state_dict
(/root/reference/libs/trainers/BaseTrainer.py:168-191; key layout set by the
module tree in libs/renders/BaseRender.py + libs/nerfheads/trainhead.py +
libs/encoders/UNet.py). This module maps our flax variables pytree to/from
that exact key layout so (a) our checkpoints are loadable by torch tooling
and (b) the published reference checkpoints (`cam3zju_zjuval_70.pth`,
README.md:73-79) can be imported for parity evaluation.

Weight-layout transforms:
  * Conv2d: flax (kh, kw, ci, co) <-> torch (co, ci, kh, kw)
  * Linear: flax (in, out) <-> torch (out, in)
  * spconv SubM/SparseConv3d: ours (27, ci, co) <-> spconv 1.2.1
    (kD, kH, kW, ci, co); a (co, ci, kD, kH, kW) layout (spconv 2.x) is
    sniffed by shape and transposed. Tap order is D-major (d, h, w), the
    torch/spconv convention.
  * BatchNorm1d: weight/bias/running_mean/running_var <->
    params.scale/params.bias/batch_stats.mean/batch_stats.var
  * InstanceNorm2d: weight/bias <-> scale/bias
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# key-map construction: list of (torch_key, collection, flax_path, kind)
# kind in {conv2d, linear, sparse, norm_scale, norm_bias, bn_mean, bn_var, raw}
# ---------------------------------------------------------------------------


def _encoder_map(blocks=(3, 4, 6)) -> List[Tuple[str, str, Tuple[str, ...], str]]:
    """`blocks`: BasicBlock counts per stage — (3, 4, 6) is the reference's
    resnet34 (UNet.py:149); (2, 2, 2) / (1, 1, 1) cover the resnet18 and
    test-only tiny variants."""
    m = []

    def conv(tk, fp):
        m.append((tk + ".weight", "params", fp + ("kernel",), "conv2d"))

    def conv_b(tk, fp):
        conv(tk, fp)
        m.append((tk + ".bias", "params", fp + ("bias",), "raw"))

    def inorm(tk, fp):
        m.append((tk + ".weight", "params", fp + ("scale",), "raw"))
        m.append((tk + ".bias", "params", fp + ("bias",), "raw"))

    conv("encoder.conv1", ("encoder", "conv1"))
    inorm("encoder.bn1", ("encoder", "bn1"))
    for lname, n in zip(("layer1", "layer2", "layer3"), blocks):
        for b in range(n):
            base = f"encoder.{lname}.{b}"
            fb = ("encoder", f"{lname}_{b}")
            conv(base + ".conv1", fb + ("conv1", "Conv_0"))
            inorm(base + ".bn1", fb + ("bn1",))
            conv(base + ".conv2", fb + ("conv2", "Conv_0"))
            inorm(base + ".bn2", fb + ("bn2",))
            if b == 0:
                conv(base + ".downsample.0", fb + ("ds_conv", "Conv_0"))
                inorm(base + ".downsample.1", fb + ("ds_norm",))
    # decoder: upconvN wraps a conv module (UNet.py:124-130) -> '.conv.conv'
    for tname, fname in (
        ("encoder.upconv3.conv", "upconv3"),
        ("encoder.iconv3", "iconv3"),
        ("encoder.upconv2.conv", "upconv2"),
        ("encoder.iconv2", "iconv2"),
    ):
        conv_b(tname + ".conv", ("encoder", fname, "conv", "Conv_0"))
        inorm(tname + ".bn", ("encoder", fname, "bn"))
    conv_b("encoder.out_conv", ("encoder", "out_conv"))
    return m


def _sparse_block_map(tprefix, fprefix, kind) -> List:
    """kind 'double': Sequential(SubM, BN, ReLU, SubM, BN, ReLU);
    kind 'stride': Sequential(SparseConv, BN, ReLU)."""
    m = []

    def bn(tk, fp):
        m.append((tk + ".weight", "params", fp + ("scale",), "raw"))
        m.append((tk + ".bias", "params", fp + ("bias",), "raw"))
        m.append((tk + ".running_mean", "batch_stats", fp + ("mean",), "raw"))
        m.append((tk + ".running_var", "batch_stats", fp + ("var",), "raw"))

    if kind == "double":
        m.append((tprefix + ".0.weight", "params", fprefix + ("w0",), "sparse"))
        bn(tprefix + ".1", fprefix + ("bn0",))
        m.append((tprefix + ".3.weight", "params", fprefix + ("w1",), "sparse"))
        bn(tprefix + ".4", fprefix + ("bn1",))
    else:
        m.append((tprefix + ".0.weight", "params", fprefix + ("w",), "sparse"))
        bn(tprefix + ".1", fprefix + ("bn",))
    return m


def _mlp_map(tprefix, fprefix, n_layers) -> List:
    m = []
    for k in range(n_layers):
        m.append(
            (f"{tprefix}.{2 * k}.weight", "params", fprefix + (f"dense_{k}", "kernel"), "linear")
        )
        m.append(
            (f"{tprefix}.{2 * k}.bias", "params", fprefix + (f"dense_{k}", "bias"), "raw")
        )
    return m


def _head_map(n_layers=4) -> List:
    m = []
    m.append(("nerfhead.sigmahead.c.weight", "params", ("head", "sigmahead", "c"), "raw"))
    attn = ("head", "sigmahead", "xyzc_attn")
    for w in ("w_qs", "w_ks", "w_vs", "fc"):
        m.append(
            (f"nerfhead.sigmahead.xyzc_attn.{w}.weight", "params", attn + (w, "kernel"), "linear")
        )
    m.append(
        ("nerfhead.sigmahead.xyzc_attn.layer_norm.weight", "params", attn + ("layer_norm", "scale"), "raw")
    )
    m.append(
        ("nerfhead.sigmahead.xyzc_attn.layer_norm.bias", "params", attn + ("layer_norm", "bias"), "raw")
    )
    # xyzc_net: torch ModuleList index -> our names
    net = ("head", "sigmahead", "xyzc_net")
    idx = 0
    m += _sparse_block_map("nerfhead.sigmahead.xyzc_net.net.0", net + ("subm0",), "double")
    for i in range(n_layers):
        m += _sparse_block_map(
            f"nerfhead.sigmahead.xyzc_net.net.{2 * i + 1}", net + (f"down{i}",), "stride"
        )
        m += _sparse_block_map(
            f"nerfhead.sigmahead.xyzc_net.net.{2 * i + 2}", net + (f"subm{i + 1}",), "double"
        )
    del idx
    m += _mlp_map(
        "nerfhead.sigmahead.out_geometry_fc", ("head", "sigmahead", "out_geometry_fc"), 1
    )
    rgb = ("head", "rgbhead")
    m += _mlp_map("nerfhead.rgbhead.base_fc", rgb + ("base_fc",), 2)
    m += _mlp_map("nerfhead.rgbhead.vis_fc", rgb + ("vis_fc",), 2)
    m += _mlp_map("nerfhead.rgbhead.rgb_fc", rgb + ("rgb_fc",), 3)
    m += _mlp_map("nerfhead.rgbhead.out_geometry_fc", rgb + ("out_geometry_fc",), 4)
    return m


_ENCODER_BLOCKS = {"resnet34": (3, 4, 6), "resnet18": (2, 2, 2), "tiny": (1, 1, 1)}


def full_key_map(n_layers=4, encoder_blocks=(3, 4, 6)):
    return _encoder_map(encoder_blocks) + _head_map(n_layers)


def _infer_encoder_blocks(encoder_params):
    """Block counts per stage from the flax param tree (layerN_B keys)."""
    return tuple(
        sum(1 for k in encoder_params if k.startswith(f"layer{i}_"))
        for i in (1, 2, 3)
    )


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


def _to_torch(arr, kind):
    a = np.asarray(arr)
    if kind == "conv2d":
        return np.ascontiguousarray(a.transpose(3, 2, 0, 1))
    if kind == "linear":
        return np.ascontiguousarray(a.T)
    if kind == "sparse":  # (27, ci, co) -> (3,3,3, ci, co)
        return np.ascontiguousarray(a.reshape(3, 3, 3, a.shape[1], a.shape[2]))
    return a


def _from_torch(a, kind, target_shape):
    a = np.asarray(a)
    if kind == "conv2d":
        return np.ascontiguousarray(a.transpose(2, 3, 1, 0))
    if kind == "linear":
        return np.ascontiguousarray(a.T)
    if kind == "sparse":
        if a.ndim == 5 and a.shape[:3] == (3, 3, 3):
            return a.reshape(27, a.shape[3], a.shape[4])
        if a.ndim == 5 and a.shape[2:] == (3, 3, 3):
            # (co, ci, kd, kh, kw) layout (spconv 2.x)
            return np.ascontiguousarray(a.transpose(2, 3, 4, 1, 0)).reshape(
                27, a.shape[1], a.shape[0]
            )
        raise ValueError(f"unknown sparse weight layout {a.shape}")
    return a.reshape(target_shape)


# ---------------------------------------------------------------------------
# pytree walking
# ---------------------------------------------------------------------------


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree, path, value):
    for p in path[:-1]:
        tree = tree.setdefault(p, {})
    tree[path[-1]] = value


def variables_to_torch_state(variables, n_layers=4) -> Dict[str, np.ndarray]:
    """{'encoder': vars, 'head': vars} -> torch-style flat state_dict
    (numpy values; callers wrap with torch.from_numpy for torch.save)."""
    state = {}
    blocks = _infer_encoder_blocks(variables["encoder"]["params"])
    for tk, coll, path, kind in full_key_map(n_layers, blocks):
        root, rest = path[0], path[1:]
        tree = variables[root][coll]
        state[tk] = _to_torch(_get(tree, rest), kind)
    # BatchNorm1d bookkeeping counters: torch's strict load (the reference's
    # inference path, tools/inference.py:70-74) requires them present
    for tk in list(state):
        if tk.endswith(".running_mean"):
            state[tk[: -len("running_mean")] + "num_batches_tracked"] = np.asarray(
                0, dtype=np.int64
            )
    return state


def torch_state_to_variables(state, variables_template, n_layers=4, strict=True):
    """Inverse: fill a deep copy of `variables_template` from a torch-style
    state_dict (numpy or torch tensors)."""
    import copy

    import jax.numpy as jnp

    out = copy.deepcopy(
        {k: {c: dict_copy(v) for c, v in variables_template[k].items()} for k in variables_template}
    )
    missing = []
    blocks = _infer_encoder_blocks(variables_template["encoder"]["params"])
    for tk, coll, path, kind in full_key_map(n_layers, blocks):
        if tk not in state:
            if strict:
                missing.append(tk)
            continue
        val = state[tk]
        if hasattr(val, "numpy"):
            val = val.detach().cpu().numpy()
        root, rest = path[0], path[1:]
        target = _get(variables_template[root][coll], rest)
        converted = _from_torch(val, kind, np.asarray(target).shape)
        assert converted.shape == np.asarray(target).shape, (
            tk,
            converted.shape,
            np.asarray(target).shape,
        )
        _set(out[root][coll], rest, jnp.asarray(converted))
    if missing:
        raise KeyError(f"missing torch keys: {missing[:5]} (+{len(missing) - 5})")
    return out


def dict_copy(tree):
    if isinstance(tree, dict):
        return {k: dict_copy(v) for k, v in tree.items()}
    return tree
