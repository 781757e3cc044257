"""yacs-compat config system tests (schema of
/root/reference/configs/default.py:1-141)."""

import pytest

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.config.yacs_compat import CfgNode as CN


@pytest.fixture()
def cfg():
    return _cfg.clone()


def test_defaults_match_reference_schema(cfg):
    assert cfg.train.n_rays == 1024
    assert cfg.train.n_samples == 64
    assert cfg.dataset.voxel_size == [0.005, 0.005, 0.005]
    assert cfg.head.sigma.n_smpl == 6890
    assert cfg.head.sigma.outdims == [32, 32, 32, 32]
    assert cfg.dataset.train.chunk == 400
    assert cfg.dataset.test.chunk == 2000
    assert cfg.train.lr == 1e-4
    assert cfg.train.weight_decay == 1e-4


def test_merge_from_file_and_freeze(cfg, tmp_path):
    yaml_file = tmp_path / "exp.yaml"
    yaml_file.write_text(
        "train:\n  lr: 0.001\nhead:\n  sigma:\n    code_dim: 32\n"
    )
    cfg.merge_from_file(str(yaml_file))
    assert cfg.train.lr == 0.001
    assert cfg.head.sigma.code_dim == 32
    cfg.freeze()
    with pytest.raises(AttributeError):
        cfg.train.lr = 0.1
    cfg.defrost()
    cfg.train.lr = 0.1
    assert cfg.train.lr == 0.1


def test_merge_from_list_dotted_overrides(cfg):
    cfg.merge_from_list(
        ["render.file", "demo_render", "test.is_vis", "True", "head.sigma.code_dim", "16"]
    )
    assert cfg.render.file == "demo_render"
    assert cfg.test.is_vis is True
    assert cfg.head.sigma.code_dim == 16


def test_unknown_key_rejected(cfg):
    with pytest.raises(KeyError):
        cfg.merge_from_list(["nonexistent.key", "1"])


def test_type_mismatch_rejected(cfg):
    with pytest.raises(ValueError):
        cfg.merge_from_list(["train.n_rays", "'a_string'"])


def test_int_to_float_coercion(cfg):
    cfg.merge_from_list(["train.lr", "1"])
    assert cfg.train.lr == 1.0 and isinstance(cfg.train.lr, float)


def test_shipped_experiment_yamls_merge():
    import os

    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in ("trainzju_valzju.yaml", "trainthu_valzju.yaml"):
        c = _cfg.clone()
        c.merge_from_file(os.path.join(here, "configs", name))
        assert c.head.sigma.code_dim == 32
        assert c.encoder.out_ch == 32


def test_nested_cfgnode_constructor():
    node = CN({"a": {"b": 1}, "c": [1, 2]})
    assert node.a.b == 1
    assert node.c == [1, 2]
