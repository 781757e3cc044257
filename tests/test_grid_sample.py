"""grid_sample parity vs torch.nn.functional.grid_sample (the reference's
kernel: align_corners=True, padding_mode='zeros')."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gpnerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("shape", [(2, 3, 8, 9), (3, 32, 128, 128)])
def test_grid_sample_2d_matches_torch(seed, shape):
    rng = np.random.default_rng(seed)
    N, C, H, W = shape
    img = rng.standard_normal(shape).astype(np.float32)
    # include in-bounds, out-of-bounds and exactly-on-edge coords
    grid = rng.uniform(-1.4, 1.4, size=(N, 5, 7, 2)).astype(np.float32)
    grid[:, 0, 0] = [-1.0, -1.0]
    grid[:, 0, 1] = [1.0, 1.0]

    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid), align_corners=True
    ).numpy()
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0])
def test_grid_sample_3d_matches_torch(seed):
    rng = np.random.default_rng(seed)
    N, C, D, H, W = 1, 4, 6, 7, 8
    vol = rng.standard_normal((N, C, D, H, W)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(N, 3, 4, 5, 3)).astype(np.float32)
    grid[:, 0, 0, 0] = [-1.0, -1.0, -1.0]
    grid[:, 0, 0, 1] = [1.0, 1.0, 1.0]

    ref = F.grid_sample(
        torch.from_numpy(vol),
        torch.from_numpy(grid),
        align_corners=True,
        padding_mode="zeros",
    ).numpy()
    out = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


def test_quad_table_matches_grid_sample_2d():
    """Packed-quad bilinear == grid_sample_2d_nhwc (incl. boundary taps)."""
    from gpnerf_tpu.ops.grid_sample import (
        bilinear_quad_nhwc,
        build_quad_table_2d,
        grid_sample_2d_nhwc,
    )

    rng = np.random.default_rng(7)
    V, H, W, C = 2, 9, 11, 5
    img = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    # cover interior, the [-1, 0) boundary band, and fully-outside samples
    grid = jnp.asarray(
        rng.uniform(-1.4, 1.4, size=(V, 300, 2)).astype(np.float32)
    )
    ref = grid_sample_2d_nhwc(img, grid)
    table = build_quad_table_2d(img)
    out = bilinear_quad_nhwc(table, grid, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_octet_table_matches_trilinear_dense_rows():
    from gpnerf_tpu.ops.grid_sample import (
        build_octet_table_3d,
        trilinear_dense_rows,
        trilinear_octet_rows,
    )

    rng = np.random.default_rng(8)
    D, H, W, C = 6, 7, 8, 4
    vol = jnp.asarray(rng.standard_normal((D, H, W, C)).astype(np.float32))
    pos = jnp.asarray(
        rng.uniform(-1.5, max(D, H, W) + 0.5, size=(500, 3)).astype(np.float32)
    )
    dyn = jnp.asarray([D - 1, H, W - 2], jnp.int32)  # dynamic valid extent
    ref = trilinear_dense_rows(vol, pos, dyn_size=dyn)
    table = build_octet_table_3d(vol)
    out = trilinear_octet_rows(table, pos, dyn)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_quad_projection_matches_reference_path():
    """project_and_gather_quad == project_and_gather on random geometry."""
    from gpnerf_tpu.ops.grid_sample import build_quad_table_2d
    from gpnerf_tpu.ops.projection import project_and_gather, project_and_gather_quad

    rng = np.random.default_rng(9)
    V, H, W, C = 3, 16, 16, 6
    src = jnp.asarray(rng.standard_normal((V, H, W, 3)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((V, H // 4, W // 4, C)).astype(np.float32))
    KE = jnp.asarray(
        np.stack([np.eye(4, dtype=np.float32) for _ in range(V)])
        + 0.01 * rng.standard_normal((V, 4, 4)).astype(np.float32)
    )
    xyz = jnp.asarray(rng.uniform(-2, 2, size=(400, 3)).astype(np.float32))
    ref_feat, ref_mask = project_and_gather(xyz, KE, src, feat, H, W)
    q_feat, q_mask = project_and_gather_quad(
        xyz, KE, build_quad_table_2d(src), build_quad_table_2d(feat), H, W
    )
    np.testing.assert_allclose(np.asarray(q_feat), np.asarray(ref_feat), rtol=1e-5, atol=1e-6)
    np.testing.assert_array_equal(np.asarray(q_mask), np.asarray(ref_mask))


def test_u8_src_quad_projection_matches_float_path():
    """project_and_gather_quad with a RAW-uint8 source table + 1/255
    src_scale == the float-table path (the ref-mode split gather stores the
    original uint8 pixel bytes: u8 taps are exact in the lerp, the affine
    1/255 commutes out of the weighted sum; 4x fewer gathered bytes)."""
    from gpnerf_tpu.ops.grid_sample import build_quad_table_2d
    from gpnerf_tpu.ops.projection import project_and_gather_quad

    rng = np.random.default_rng(17)
    V, H, W, C = 3, 16, 16, 6
    src_u8 = rng.integers(0, 256, size=(V, H, W, 3), dtype=np.uint8)
    src_f = jnp.asarray(src_u8.astype(np.float32) / 255.0)
    feat = jnp.asarray(
        rng.standard_normal((V, H // 4, W // 4, C)).astype(np.float32)
    )
    KE = jnp.asarray(
        np.stack([np.eye(4, dtype=np.float32) for _ in range(V)])
        + 0.01 * rng.standard_normal((V, 4, 4)).astype(np.float32)
    )
    xyz = jnp.asarray(rng.uniform(-2, 2, size=(400, 3)).astype(np.float32))
    fq = build_quad_table_2d(feat)
    ref_feat, ref_mask = project_and_gather_quad(
        xyz, KE, build_quad_table_2d(src_f), fq, H, W
    )
    u8_feat, u8_mask = project_and_gather_quad(
        xyz, KE, build_quad_table_2d(jnp.asarray(src_u8)), fq, H, W,
        src_scale=jnp.full((3,), 1.0 / 255.0, jnp.float32),
    )
    np.testing.assert_allclose(
        np.asarray(u8_feat), np.asarray(ref_feat), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(u8_mask), np.asarray(ref_mask))


def test_i8_feat_quad_projection_close_to_float_path():
    """project_and_gather_quad with an int8-quantized feature table +
    per-channel feat_scale tracks the float path within quantization
    tolerance (split/reference-semantics mode under tpu.quantize_proj —
    the full-set PSNR gate judges the shipped default)."""
    from gpnerf_tpu.ops.grid_sample import (
        build_quad_table_2d,
        quantize_image_i8,
    )
    from gpnerf_tpu.ops.projection import project_and_gather_quad

    rng = np.random.default_rng(23)
    V, H, W, C = 3, 16, 16, 8
    src = jnp.asarray(rng.random((V, H, W, 3)).astype(np.float32))
    feat = rng.standard_normal((V, H // 4, W // 4, C)).astype(np.float32)
    KE = jnp.asarray(
        np.stack([np.eye(4, dtype=np.float32) for _ in range(V)])
        + 0.01 * rng.standard_normal((V, 4, 4)).astype(np.float32)
    )
    xyz = jnp.asarray(rng.uniform(-2, 2, size=(400, 3)).astype(np.float32))
    sq = build_quad_table_2d(src)
    f_ref, m_ref = project_and_gather_quad(
        xyz, KE, sq, build_quad_table_2d(jnp.asarray(feat)), H, W
    )
    qf, fs = quantize_image_i8(jnp.asarray(feat))
    f_q, m_q = project_and_gather_quad(
        xyz, KE, sq, build_quad_table_2d(qf), H, W, feat_scale=fs
    )
    amax = np.abs(feat.reshape(-1, C)).max(axis=0)
    np.testing.assert_allclose(
        np.asarray(f_q[..., 3:]), np.asarray(f_ref[..., 3:]),
        atol=float(amax.max()) / 127.0 * 2.0,
    )
    np.testing.assert_array_equal(np.asarray(m_q), np.asarray(m_ref))


def test_quad_pv_gather_matches_per_view_form():
    """bilinear_quad_nhwc_pv ((P, V)-ordered view-concat gather) ==
    bilinear_quad_nhwc transposed, including out-of-bounds zeroing."""
    from gpnerf_tpu.ops.grid_sample import (
        bilinear_quad_nhwc,
        bilinear_quad_nhwc_pv,
        build_quad_table_2d,
    )

    rng = np.random.default_rng(3)
    V, H, W, C = 3, 9, 7, 5
    img = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    tab = build_quad_table_2d(img)
    grid = jnp.asarray(
        rng.uniform(-1.3, 1.3, size=(V, 64, 2)).astype(np.float32)
    )
    ref = bilinear_quad_nhwc(tab, grid, H, W).transpose(1, 0, 2)
    out = bilinear_quad_nhwc_pv(tab, grid, H, W)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-7)


def test_merged_lowres_projection_matches_separate_gathers():
    """project_and_gather_quad_merged with a low-res [rgb|feat] table ==
    separate quad gathers when BOTH maps live on the same (feature) grid."""
    from gpnerf_tpu.ops.grid_sample import build_quad_table_2d
    from gpnerf_tpu.ops.projection import (
        project_and_gather_quad,
        project_and_gather_quad_merged,
    )

    rng = np.random.default_rng(11)
    V, H, W, C = 3, 16, 16, 6
    Hf, Wf = 5, 5
    src_low = jnp.asarray(rng.standard_normal((V, Hf, Wf, 3)).astype(np.float32))
    feat = jnp.asarray(rng.standard_normal((V, Hf, Wf, C)).astype(np.float32))
    KE = jnp.asarray(
        np.stack([np.eye(4, dtype=np.float32) for _ in range(V)])
        + 0.01 * rng.standard_normal((V, 4, 4)).astype(np.float32)
    )
    xyz = jnp.asarray(rng.uniform(-2, 2, size=(200, 3)).astype(np.float32))
    # reference: separate bilinear gathers of each map on the SAME
    # (feature-resolution) grid, normalized in the (H, W) pixel frame
    from gpnerf_tpu.ops.grid_sample import bilinear_quad_nhwc
    from gpnerf_tpu.ops.projection import (
        compute_projections,
        inbound_mask,
        normalize_pixels,
    )

    pixel, in_front = compute_projections(xyz, KE)
    norm_pix = normalize_pixels(pixel, H, W)
    rgb = bilinear_quad_nhwc(build_quad_table_2d(src_low), norm_pix, Hf, Wf)
    ft = bilinear_quad_nhwc(build_quad_table_2d(feat), norm_pix, Hf, Wf)
    ref_feat = jnp.concatenate([rgb, ft], axis=-1).transpose(1, 0, 2)
    ref_mask = (inbound_mask(pixel, H, W) & in_front).astype(ref_feat.dtype).T
    comb = jnp.concatenate([src_low, feat], axis=-1)
    m_feat, m_mask = project_and_gather_quad_merged(
        xyz, KE, build_quad_table_2d(comb), H, W
    )
    np.testing.assert_allclose(
        np.asarray(m_feat), np.asarray(ref_feat), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(m_mask), np.asarray(ref_mask))


def test_octet_u32_pack_bit_exact():
    """build_octet_table_3d_u32 (packed-word build) gathers bit-identically
    to the u8 octet table: same rows, same dequantized output."""
    from gpnerf_tpu.ops.grid_sample import (
        build_octet_table_3d,
        build_octet_table_3d_u32,
        quantize_volume_u8,
        trilinear_octet_rows,
    )

    rng = np.random.default_rng(21)
    D, H, W, C = 5, 6, 7, 8
    vol = jnp.asarray(
        np.abs(rng.standard_normal((D, H, W, C))).astype(np.float32)
    )
    q, sc = quantize_volume_u8(vol)
    pos = jnp.asarray(
        rng.uniform(-1.5, max(D, H, W) + 0.5, size=(400, 3)).astype(np.float32)
    )
    dyn = jnp.asarray([D, H - 1, W], jnp.int32)
    ref = trilinear_octet_rows(build_octet_table_3d(q), pos, dyn, scale=sc)
    out = trilinear_octet_rows(build_octet_table_3d_u32(q), pos, dyn, scale=sc)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_quantized_proj_table_close_and_linear():
    """int8-quantized merged projection gather: dequant-after-lerp equals
    lerp-of-dequant (linearity, exact in f32 up to rounding), and the
    quantized result tracks the unquantized gather within the per-channel
    quantization step."""
    from gpnerf_tpu.ops.grid_sample import (
        bilinear_quad_nhwc_pv,
        build_quad_table_2d,
        quantize_image_i8,
    )

    rng = np.random.default_rng(22)
    V, H, W, C = 3, 12, 11, 6
    img = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    q, sc = quantize_image_i8(img)
    tab_q = build_quad_table_2d(q)
    grid = jnp.asarray(
        rng.uniform(-1.3, 1.3, size=(V, 200, 2)).astype(np.float32)
    )
    out_q = bilinear_quad_nhwc_pv(tab_q, grid, H, W, scale=sc)
    # linearity: dequantizing the table first gives the same interpolant
    deq = q.astype(np.float32) * np.asarray(sc)
    ref_lin = bilinear_quad_nhwc_pv(
        build_quad_table_2d(jnp.asarray(deq)), grid, H, W
    )
    np.testing.assert_allclose(
        np.asarray(out_q), np.asarray(ref_lin), rtol=1e-5, atol=1e-6
    )
    # accuracy: within one quantization step of the float gather
    ref = bilinear_quad_nhwc_pv(build_quad_table_2d(img), grid, H, W)
    err = np.abs(np.asarray(out_q) - np.asarray(ref))
    assert (err < np.asarray(sc)[None, None, :] + 1e-6).all()


def test_pallas_lerp_matches_pv_form():
    """The fused Pallas weighted-sum/dequant kernel (interpret mode on CPU)
    reproduces bilinear_quad_nhwc_pv on an int8 table: same taps, same
    in-bounds masking, dequant after the sum (f32 accumulation is tighter
    than the pv form's compute-dtype accumulation, hence the loose rtol)."""
    from unittest import mock

    from gpnerf_tpu.ops import pallas_lerp
    from gpnerf_tpu.ops.grid_sample import (
        bilinear_quad_nhwc_pv,
        bilinear_quad_nhwc_pv_pallas,
        build_quad_table_2d,
        quantize_image_i8,
    )

    rng = np.random.default_rng(7)
    V, H, W, C = 3, 12, 11, 6
    img = jnp.asarray(rng.standard_normal((V, H, W, C)).astype(np.float32))
    q, sc = quantize_image_i8(img)
    tab = build_quad_table_2d(q)
    grid = jnp.asarray(
        rng.uniform(-1.3, 1.3, size=(V, 300, 2)).astype(np.float32)
    )
    ref = bilinear_quad_nhwc_pv(tab, grid, H, W, scale=sc)
    orig = pallas_lerp.quad_lerp_rows_vcp

    def interp(*a, **kw):
        kw["interpret"] = True
        kw["block"] = 128
        return orig(*a, **kw)

    with mock.patch.object(pallas_lerp, "quad_lerp_rows_vcp", interp):
        out = bilinear_quad_nhwc_pv_pallas(tab, grid, H, W, scale=sc)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32),
        rtol=1e-5, atol=1e-6,
    )


def test_octet_scatter_build_matches_concat_build():
    """build_octet_table_scatter (corner-scatter from active rows) is
    byte-identical to build_octet_table_3d(scatter_dense(...)) and gathers
    identically through trilinear_octet_rows, including dedup'd invalid
    rows and uint8 quantized features."""
    from gpnerf_tpu.ops.grid_sample import (
        build_octet_table_3d,
        build_octet_table_scatter,
        trilinear_octet_rows,
    )
    from gpnerf_tpu.ops.sparse_conv import build_sparse_grid, scatter_dense

    rng = np.random.default_rng(11)
    D, H, W, C = 6, 7, 5, 4
    cap = 40
    coords = jnp.asarray(
        rng.integers(0, [D, H, W], size=(cap, 3)), jnp.int32
    )
    valid = jnp.asarray(rng.uniform(size=cap) < 0.8)
    grid = build_sparse_grid(coords, valid, (D, H, W))  # dedups
    feats = jnp.asarray(
        rng.integers(0, 255, size=(cap, C)), jnp.uint8
    )
    feats_masked = jnp.where(grid.valid[:, None], feats, 0)
    ref_table = build_octet_table_3d(scatter_dense(feats_masked, grid))
    flat = build_octet_table_scatter(
        feats_masked, grid.coords, grid.valid, grid.shape
    )
    Dp, Hp, Wp = flat.shape
    assert (Dp, Hp, Wp) == (D + 1, H + 1, W + 1)
    np.testing.assert_array_equal(
        np.asarray(flat.rows[:-1]).reshape(Dp, Hp, Wp, 8 * C),
        np.asarray(ref_table),
    )
    # gather parity through both table forms, incl. dequant scale
    pos = jnp.asarray(
        rng.uniform(-1.5, max(D, H, W) + 0.5, size=(200, 3)).astype(np.float32)
    )
    dyn = jnp.asarray([D - 1, H, W - 1], jnp.int32)
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=C).astype(np.float32))
    ref = trilinear_octet_rows(ref_table, pos, dyn, scale=scale)
    out = trilinear_octet_rows(flat, pos, dyn, scale=scale)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_nearest_table_semantics_and_upsample_accuracy():
    """NearestTable (tpu.coarse_nearest): exact at grid points, zero
    outside the dynamic extent, and the level-1-grid upsampled form
    (div=2) approximates the trilinear field strictly better than
    nearest at the native coarse grid (div=4)."""
    from gpnerf_tpu.ops.grid_sample import (
        NearestTable,
        build_octet_table_3d,
        nearest_rows,
        quantize_image_i8,
        resample_volume_to,
        trilinear_octet_rows,
    )

    rng = np.random.default_rng(3)
    D, H, W, C = 6, 7, 5, 8
    # smooth signed field (the folded coarse features are smooth and
    # signed): low-frequency mixture so interpolation order matters
    g = np.stack(
        np.meshgrid(
            np.linspace(0, 1, D), np.linspace(0, 1, H),
            np.linspace(0, 1, W), indexing="ij",
        ),
        axis=-1,
    )
    freqs = rng.normal(size=(3, C))
    vol = jnp.asarray(
        np.sin(2.5 * g @ freqs + rng.normal(size=C)).astype(np.float32)
    )
    q, sc = quantize_image_i8(vol)
    tab1 = NearestTable(q.reshape(-1, C), (D, H, W), 4)
    dyn = jnp.asarray([D, H - 1, W], jnp.int32)

    # exact at grid points (inside the dynamic extent)
    pts = jnp.asarray(
        [[0, 0, 0], [D - 1, 0, W - 1], [2, H - 2, 3]], jnp.float32
    )
    out = nearest_rows(tab1, pts, dyn, scale=sc)
    expect = np.asarray(q).reshape(D, H, W, C)[
        tuple(np.asarray(pts, np.int32).T)
    ].astype(np.float32) * np.asarray(sc)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)

    # zero outside the dynamic extent (matches octet-table cull semantics)
    out_oob = nearest_rows(
        tab1,
        jnp.asarray([[0, H - 1.4, 0], [-0.6, 0, 0]], jnp.float32),
        dyn, scale=sc,
    )
    np.testing.assert_array_equal(np.asarray(out_oob), 0.0)

    # accuracy ladder vs the f32 trilinear field on the SAME positions;
    # mirror query_octet2: frac of the level-0 extent mapped per-grid
    out_sh = jnp.asarray([4 * D - 3, 4 * H - 2, 4 * W - 1], jnp.int32)
    frac = jnp.asarray(
        rng.uniform(0.02, 0.95, size=(4096, 3)).astype(np.float32)
    )
    size4 = out_sh // 4
    ref = trilinear_octet_rows(
        build_octet_table_3d(vol), frac * (size4 - 1), size4
    )
    near4 = nearest_rows(tab1, frac * (size4 - 1), size4, scale=sc)
    up_sh = (2 * D, 2 * H, 2 * W)
    vol_up = resample_volume_to(vol, up_sh, out_sh // 2, out_sh // 4)
    q2, sc2 = quantize_image_i8(vol_up)
    tab2 = NearestTable(q2.reshape(-1, C), up_sh, 2)
    size2 = out_sh // 2
    near2 = nearest_rows(tab2, frac * (size2 - 1), size2, scale=sc2)
    e4 = float(jnp.abs(near4 - ref).mean())
    e2 = float(jnp.abs(near2 - ref).mean())
    assert e2 < 0.6 * e4, (e2, e4)


def test_interleave_midpoints_matches_halfgrid_trilinear():
    """interleave_midpoints_3d (tpu.l1_nearest=2): exact midpoint doubling
    of a uint8 field — even indices are the original points, odd indices
    rounded neighbor averages, i.e. align-corners trilinear 2x upsampling
    restricted to the half-grid (to u8 rounding: <= 0.5/axis)."""
    from gpnerf_tpu.ops.grid_sample import (
        NearestTable,
        interleave_midpoints_3d,
        nearest_rows,
        resample_volume_to,
    )

    rng = np.random.default_rng(11)
    D, H, W, C = 5, 4, 6, 3
    vol = jnp.asarray(
        rng.integers(0, 256, size=(D, H, W, C), dtype=np.uint8)
    )
    up = interleave_midpoints_3d(vol)
    assert up.shape == (2 * D - 1, 2 * H - 1, 2 * W - 1, C)
    # even indices: identity (the original grid points)
    np.testing.assert_array_equal(
        np.asarray(up)[::2, ::2, ::2], np.asarray(vol)
    )
    # the whole doubled field is the align-corners trilinear 2x upsample
    # sampled at half-integers, within the per-axis u8 rounding (<= 0.5
    # per doubling pass, three passes)
    sh2 = (2 * D - 1, 2 * H - 1, 2 * W - 1)
    ref = resample_volume_to(
        vol.astype(jnp.float32), sh2,
        jnp.asarray(sh2, jnp.int32), jnp.asarray([D, H, W], jnp.int32),
    )
    diff = np.abs(np.asarray(up, np.float32) - np.asarray(ref))
    assert diff.max() <= 1.5 + 1e-3, diff.max()
    # nearest_rows through the doubled table at doubled-grid units (the
    # query_octet2 interleave mapping: size s -> 2s-1) returns the original
    # values at even positions
    tab = NearestTable(up.reshape(-1, C), sh2, 2, 2)
    pts = jnp.asarray([[0, 0, 0], [D - 1, H - 1, W - 1], [2, 1, 3]],
                      jnp.float32) * 2.0
    out = nearest_rows(tab, pts, jnp.asarray(sh2, jnp.int32))
    expect = np.asarray(vol)[
        tuple((np.asarray(pts, np.int32) // 2).T)
    ].astype(np.float32)
    np.testing.assert_allclose(np.asarray(out), expect, rtol=1e-6)


def test_nearest_table_lerp_axes_matches_trilinear():
    """NearestTable.lerp_axes (tpu.l1_nearest = 10+bitmask): the full
    bitmask (7) reproduces trilinear_dense_rows exactly (zeros padding),
    and single-axis lerp is strictly more accurate than pure nearest on
    a smooth field."""
    from gpnerf_tpu.ops.grid_sample import (
        NearestTable,
        nearest_rows,
        trilinear_dense_rows,
    )

    rng = np.random.default_rng(5)
    D, H, W, C = 6, 7, 5, 8
    g = np.stack(
        np.meshgrid(
            np.linspace(0, 1, D), np.linspace(0, 1, H),
            np.linspace(0, 1, W), indexing="ij",
        ),
        axis=-1,
    )
    freqs = rng.normal(size=(3, C))
    vol = jnp.asarray(
        np.sin(2.0 * g @ freqs + rng.normal(size=C)).astype(np.float32)
    )
    dyn = jnp.asarray([D, H - 1, W], jnp.int32)
    pos = jnp.asarray(
        np.concatenate(
            [
                rng.uniform(-1.2, max(D, H, W), size=(800, 3)),
                # exactly-on-grid and boundary positions
                [[0, 0, 0], [D - 1, 0, W - 1], [2.0, H - 2, 3.0]],
            ]
        ).astype(np.float32)
    )
    ref = trilinear_dense_rows(vol, pos, dyn_size=dyn)
    tab7 = NearestTable(vol.reshape(-1, C), (D, H, W), 2, 1, 7)
    out7 = nearest_rows(tab7, pos, dyn)
    np.testing.assert_allclose(
        np.asarray(out7), np.asarray(ref), rtol=1e-5, atol=1e-6
    )
    # accuracy ladder on interior points: nearest < single-axis < full
    interior = jnp.asarray(
        rng.uniform(0.5, min(D, H - 1, W) - 1.5, size=(4096, 3)).astype(
            np.float32
        )
    )
    ref_i = trilinear_dense_rows(vol, interior, dyn_size=dyn)
    errs = {}
    for bits in (0, 1, 2, 4):
        tab = NearestTable(vol.reshape(-1, C), (D, H, W), 2, 1, bits)
        errs[bits] = float(
            jnp.abs(nearest_rows(tab, interior, dyn) - ref_i).mean()
        )
    assert all(errs[b] < errs[0] for b in (1, 2, 4)), errs
