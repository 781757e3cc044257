"""Folded coarse octet table (tpu.fold_coarse_fc): correctness.

The optimization pre-applies out_geometry_fc's coarse-channel block W2 to
the merged coarse volume at table-build time (render/demo.py), relying on
trilinear interpolation commuting with linear maps:
    trilerp(W2 @ v, x) == W2 @ trilerp(v, x).
Checks the identity on the real table ops, and the end-to-end demo render
fold-on vs fold-off (unquantized, so the fold is exact up to bf16 dots).
"""

import os
import random
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def test_trilerp_commutes_with_linear():
    """trilinear_octet_rows(W2 @ v) == W2 @ trilinear_octet_rows(v)."""
    from gpnerf_tpu.ops.grid_sample import (
        build_octet_table_3d,
        trilinear_octet_rows,
    )

    rng = np.random.RandomState(0)
    D, H, W, C, Cout, P = 5, 6, 7, 96, 64, 400
    vol = jnp.asarray(rng.randn(D, H, W, C).astype(np.float32))
    w2 = jnp.asarray(rng.randn(C, Cout).astype(np.float32) * 0.1)
    pos = jnp.asarray(
        rng.uniform(-0.5, [D - 0.5, H - 0.5, W - 0.5], (P, 3)).astype(
            np.float32
        )
    )
    size = jnp.asarray([D, H, W], jnp.int32)

    ref = trilinear_octet_rows(build_octet_table_3d(vol), pos, size) @ w2
    folded_vol = jnp.einsum("dhwc,co->dhwo", vol, w2)
    out = trilinear_octet_rows(build_octet_table_3d(folded_vol), pos, size)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4
    )


def test_packed_weights_fold_identity():
    """pack_head_weights(fold_nch): [W[:nch] | I] @ [f1; W2@fc] equals the
    full W @ [f1; fc]."""
    from gpnerf_tpu.ops.pallas_point import pack_head_weights

    rng = np.random.RandomState(1)
    nch, ncoarse, nout, C = 32, 96, 64, 35
    params = {
        "sigmahead": {
            "out_geometry_fc": {
                "dense_0": {
                    "kernel": jnp.asarray(
                        rng.randn(nch + ncoarse, nout).astype(np.float32)
                    ),
                    "bias": jnp.asarray(rng.randn(nout).astype(np.float32)),
                }
            }
        },
        "rgbhead": {
            name: {
                f"dense_{i}": {
                    "kernel": jnp.asarray(
                        rng.randn(a, b).astype(np.float32)
                    ),
                    "bias": jnp.zeros((b,), jnp.float32),
                }
                for i, (a, b) in enumerate(dims)
            }
            for name, dims in (
                ("out_geometry_fc", [(64 + 2 * C, 64), (64, 32), (32, 16),
                                     (16, 1)]),
                ("base_fc", [(3 * C, 64), (64, 32)]),
                ("vis_fc", [(32, 32), (32, 32)]),
                ("rgb_fc", [(96, 32), (32, 16), (16, 3)]),
            )
        },
    }
    w_full = pack_head_weights(params, C)[0]  # (64, 128)
    w_fold = pack_head_weights(params, C, fold_nch=nch)[0]  # (64, 96)

    f1 = jnp.asarray(rng.randn(nch, 7).astype(np.float32))
    fc = jnp.asarray(rng.randn(ncoarse, 7).astype(np.float32))
    k = params["sigmahead"]["out_geometry_fc"]["dense_0"]["kernel"]
    full = w_full @ jnp.concatenate([f1, fc], axis=0)
    fold = w_fold @ jnp.concatenate([f1, k[nch:].T @ fc], axis=0)
    np.testing.assert_allclose(
        np.asarray(fold), np.asarray(full), rtol=1e-4, atol=1e-4
    )


def test_int4_octet_roundtrip():
    """Int4 split-pack: quantize -> octet table -> trilinear query at exact
    voxel centers reproduces the quantized values (dequantized), and at
    fractional positions matches a float trilerp of the dequantized field."""
    from gpnerf_tpu.ops.grid_sample import (
        Int4Table,
        build_octet_table_3d,
        quantize_volume_i4,
        trilinear_octet_rows,
    )

    rng = np.random.RandomState(2)
    D, H, W, C = 4, 5, 6, 64
    vol = jnp.asarray(rng.randn(D, H, W, C).astype(np.float32))
    packed, scale = quantize_volume_i4(vol)
    assert packed.shape == (D, H, W, C // 2) and packed.dtype == jnp.uint8
    deq = None  # reconstruct the dequantized field for the oracle
    q = np.asarray(packed).astype(np.int32)
    lo = q & 0xF
    hi = (q >> 4) & 0xF
    dq = np.concatenate(
        [lo - ((lo & 0x8) << 1), hi - ((hi & 0x8) << 1)], axis=-1
    ).astype(np.float32) * np.asarray(scale)
    assert np.abs(dq - np.asarray(vol)).max() <= np.asarray(scale).max() * 0.51

    tab = Int4Table(build_octet_table_3d(packed))
    size = jnp.asarray([D, H, W], jnp.int32)
    # voxel centers
    ii = np.stack(np.meshgrid(range(D), range(H), range(W), indexing="ij"),
                  -1).reshape(-1, 3).astype(np.float32)
    out = trilinear_octet_rows(tab, jnp.asarray(ii), size, scale=scale)
    np.testing.assert_allclose(
        np.asarray(out), dq.reshape(-1, C), rtol=1e-5, atol=1e-5
    )
    # fractional positions vs float-trilerp oracle of the dequantized field
    pos = rng.uniform(0, [D - 1, H - 1, W - 1], (200, 3)).astype(np.float32)
    out_f = np.asarray(
        trilinear_octet_rows(tab, jnp.asarray(pos), size, scale=scale)
    )
    from gpnerf_tpu.ops.grid_sample import trilinear_dense_rows

    oracle = np.asarray(
        trilinear_dense_rows(jnp.asarray(dq), jnp.asarray(pos))
    )
    np.testing.assert_allclose(out_f, oracle, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def small_cfg():
    from gpnerf_tpu.config import cfg as _cfg

    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file(
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs", "synthetic.yaml")
    )
    cfg.dataset.H = 96
    cfg.dataset.W = 96
    cfg.dataset.ratio = 1.0
    cfg.render.file = "demo_render"
    cfg.tpu.ray_cap = 4096
    cfg.tpu.sigma_cap = 16384
    cfg.tpu.rgb_cap = 16384
    # unquantized: the fold is exact there (no quantization-error
    # redistribution), so the renders must agree to float tolerance
    cfg.tpu.quantize_volume = False
    cfg.freeze()
    return cfg


def test_demo_render_fold_parity_e2e(small_cfg):
    """End-to-end progressive render, fold on vs off, unquantized tables:
    images agree to bf16-dot tolerance."""
    from gpnerf_tpu.registry import get

    def run(fold):
        cfg = small_cfg.clone()
        cfg.defrost()
        cfg.tpu.fold_coarse_fc = fold
        cfg.freeze()
        np.random.seed(0)
        random.seed(0)
        ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
        b = ds[0]
        render = get("render", "demo_render")(cfg)
        assert render.fold_coarse_fc == fold
        variables = render.init_variables(jax.random.PRNGKey(0), b)
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        ret = render.render(variables, batch)
        from gpnerf_tpu.render.demo import pred_img_hwc

        return pred_img_hwc(ret)

    img_off = run(False)
    img_on = run(True)
    diff = np.abs(img_on - img_off)
    assert np.median(diff) < 1e-3
    assert diff.max() < 0.05, diff.max()
