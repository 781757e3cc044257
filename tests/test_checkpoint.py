"""Checkpoint interop tests: our variables <-> the reference's torch
state_dict key layout must round-trip exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.registry import get
from gpnerf_tpu.train.checkpoint import pack_state, unpack_state


def _small_variables():
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 16
    cfg.train.n_rays = 32
    cfg.train.n_samples = 8
    cfg.tpu.eval_ray_cap = 4096
    cfg.tpu.eval_chunk = 1024
    cfg.freeze()
    np.random.seed(0)
    ds = get("dataset", cfg.dataset.train.file)(cfg, is_train=True)
    render = get("render", cfg.render.file)(cfg)
    return render.init_variables(jax.random.PRNGKey(0), ds[0]), cfg


def test_torch_state_roundtrip():
    variables, cfg = _small_variables()
    state = pack_state(variables, cfg.head.sigma.n_layers)

    # reference-layout keys present
    for key in (
        "encoder.conv1.weight",
        "encoder.layer1.0.downsample.0.weight",
        "encoder.upconv3.conv.conv.weight",
        "encoder.out_conv.bias",
        "nerfhead.sigmahead.c.weight",
        "nerfhead.sigmahead.xyzc_attn.w_qs.weight",
        "nerfhead.sigmahead.xyzc_net.net.0.0.weight",
        "nerfhead.sigmahead.xyzc_net.net.0.1.running_mean",
        "nerfhead.sigmahead.xyzc_net.net.8.3.weight",
        "nerfhead.sigmahead.out_geometry_fc.0.weight",
        "nerfhead.rgbhead.base_fc.0.weight",
        "nerfhead.rgbhead.rgb_fc.4.bias",
        "nerfhead.rgbhead.out_geometry_fc.6.weight",
    ):
        assert key in state, key
    assert all(isinstance(v, torch.Tensor) for v in state.values())

    # torch layout conventions
    assert state["encoder.conv1.weight"].shape == (64, 3, 7, 7)
    assert state["nerfhead.sigmahead.xyzc_net.net.0.0.weight"].shape[:3] == (3, 3, 3)
    assert state["nerfhead.rgbhead.base_fc.0.weight"].shape == (64, 105)

    # round-trip
    restored = unpack_state(state, variables, cfg.head.sigma.n_layers)
    for (pa, a), (pb, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(variables), key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(restored), key=lambda t: str(t[0])),
    ):
        assert str(pa) == str(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))


def test_torch_save_load_file_roundtrip(tmp_path):
    variables, cfg = _small_variables()
    path = tmp_path / "ckpt.pth"
    torch.save(
        {
            "epoch": 3,
            "model": "BaseRender",
            "performance/psnr": 1.0,
            "state_dict": pack_state(variables, cfg.head.sigma.n_layers),
        },
        path,
    )
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    assert loaded["epoch"] == 3
    restored = unpack_state(loaded["state_dict"], variables, cfg.head.sigma.n_layers)
    ref = jax.tree.leaves(variables)
    got = jax.tree.leaves(restored)
    assert len(ref) == len(got)
    # parameter count preserved
    assert sum(np.asarray(a).size for a in ref) == sum(
        np.asarray(b).size for b in got
    )
