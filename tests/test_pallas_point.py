"""Parity test for the fused point-stage megakernel (ops/pallas_point.py)
against the op-by-op flax path it replaces (interpret mode — runs on CPU).

The kernel computes: projection quad-lerp + dequant, multi-view mean/var,
sigma-feat linear, density MLP (+ validity/cull masking), color MLP
(+ alpha cull) — heads.py NeRFRGBHead.density/color + NeRFSigmaHead
out_geometry_fc + ops.grid_sample.bilinear_quad_nhwc_pv semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from gpnerf_tpu.models.heads import NeRFRGBHead, fused_mean_variance
from gpnerf_tpu.models.layers import MLP
from gpnerf_tpu.ops.pallas_point import fused_point_stages, pack_head_weights


def test_fused_point_stages_parity():
    rs = np.random.RandomState(0)
    P, V, C, F = 700, 3, 35, 128

    rgbhead = NeRFRGBHead(in_feat_ch=32)
    rgb_vars = rgbhead.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 2, V, C)), jnp.zeros((2, 2, 64)),
        jnp.zeros((2, 2, V, 1)),
    )
    sf_mlp = MLP((64,), ("elu",))
    sf_vars = sf_mlp.init(jax.random.PRNGKey(1), jnp.zeros((2, F)))
    head_params = {
        "sigmahead": {"out_geometry_fc": sf_vars["params"]},
        "rgbhead": rgb_vars["params"],
    }

    rows = rs.randint(-127, 127, size=(V * P, 4 * C)).astype(np.int8)
    w4 = np.abs(rs.rand(V, 4, P)).astype(np.float32)
    w4 *= rs.rand(V, 4, P) > 0.1  # some zero taps (out of bounds)
    scale = (0.02 + rs.rand(C) * 0.05).astype(np.float32)
    feats = (rs.randn(P, F) * 0.5).astype(np.float32)
    vmask = (rs.rand(V, P) > 0.15).astype(np.float32)
    sig_ok = rs.rand(P) > 0.2

    # ---- op-by-op reference (the XLA path's math) ----
    rf = np.zeros((P, V, C), np.float32)
    for v in range(V):
        for k in range(4):
            rf[:, v, :] += (
                rows[v * P : (v + 1) * P, k * C : (k + 1) * C].astype(
                    np.float32
                )
                * w4[v, k, :, None]
            )
    rf *= scale[None, None, :]
    mean, var = fused_mean_variance(jnp.asarray(rf))
    nvo = jnp.asarray(vmask.T.sum(axis=-1, keepdims=True))
    sigma_feat = sf_mlp.apply(sf_vars, jnp.asarray(feats))
    sigma_ref = rgbhead.apply(
        rgb_vars, sigma_feat, mean[:, 0], var[:, 0], nvo,
        method=lambda m, *a: m.density(*a),
    )[:, 0]
    sigma_ref = jnp.where(jnp.asarray(sig_ok), sigma_ref, 0.0)
    alpha_ref = 1.0 - jnp.exp(-sigma_ref)
    rgb_ref = rgbhead.apply(
        rgb_vars, jnp.asarray(rf)[:, None], mean[:, None], var[:, None],
        method=lambda m, *a: m.color(*a),
    )[:, 0]
    alive_ref = (alpha_ref > 1e-14) & jnp.asarray(sig_ok)
    rgb_ref = jnp.where(alive_ref[:, None], rgb_ref, 0.0)

    # ---- fused kernel (interpret mode) ----
    weights = pack_head_weights(head_params, C)
    alpha, rgb = fused_point_stages(
        jnp.asarray(rows), jnp.asarray(w4), jnp.asarray(scale),
        jnp.asarray(feats), jnp.asarray(vmask), jnp.asarray(sig_ok),
        weights, block=256, interpret=True,
    )

    # kernel runs bf16 dot inputs / f32 accumulate; the reference here is
    # full f32 (the production XLA path is itself bf16) — pointwise bounds
    # sized for bf16 rounding through 4 matmul layers, plus a mean-error
    # bound that any wiring bug (swapped mean/var, wrong weight packing)
    # violates by orders of magnitude
    a_ref = np.asarray(alpha_ref)
    a = np.asarray(alpha)
    np.testing.assert_allclose(a, a_ref, atol=0.08, rtol=0.3)
    assert np.abs(a - a_ref).mean() < 5e-3
    # the alpha > 1e-14 cull can flip either way where bf16 rounds a
    # near-zero sigma (the production path has the same boundary fuzz);
    # compare rgb where both sides agree on aliveness and bound the
    # boundary-flip count
    alive = a > 1e-14
    alive_r = np.asarray(alive_ref)
    agree = alive == alive_r
    assert (~agree).mean() < 0.01
    r = np.asarray(rgb)[agree.nonzero()[0]]
    r_ref = np.asarray(rgb_ref)[agree.nonzero()[0]]
    np.testing.assert_allclose(r, r_ref, atol=0.08)
    assert np.abs(r - r_ref).mean() < 5e-3
    # decisively-on points agree both ways. bf16 dot inputs perturb the
    # density pre-activation by ~0.4% of O(1) activations (~1e-2 absolute),
    # so the ReLU/cull boundary can flip any |sigma| below that
    assert alive[a_ref > 0.05].all()
    assert alive_r[a > 0.05].all()


def test_fused_point_stages_geom_tabs_and_split_parity():
    """r5 kernel generalizations: (a) geometry lerped IN-KERNEL from raw
    octet/nearest rows (geom_tabs) == the XLA octet-query path; (b) the
    reference-semantics split projection form — u8 full-res rgb quad rows
    (scale 1/255) + a PRE-lerped 1-tap feature tab — == a merged float
    quad-lerp. Both against the op-by-op flax math in f32."""
    from gpnerf_tpu.ops.grid_sample import (
        NearestTable,
        build_octet_table_3d,
        nearest_row_and_weight,
        nearest_rows,
        octet_rows_and_weights,
        trilinear_octet_rows,
    )
    from gpnerf_tpu.ops.pallas_point import fused_point_stages_tabs

    rs = np.random.RandomState(1)
    P, V = 700, 3
    C1, Cc = 32, 64  # level-1 / folded-coarse channels -> F = 96
    C = 35  # 3 rgb + 32 feat

    rgbhead = NeRFRGBHead(in_feat_ch=32)
    rgb_vars = rgbhead.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 2, V, C)), jnp.zeros((2, 2, 64)),
        jnp.zeros((2, 2, V, 1)),
    )
    sf_mlp = MLP((64,), ("elu",))
    sf_vars = sf_mlp.init(jax.random.PRNGKey(1), jnp.zeros((2, C1 + Cc)))
    head_params = {
        "sigmahead": {"out_geometry_fc": sf_vars["params"]},
        "rgbhead": rgb_vars["params"],
    }

    # ---- geometry tables: u8 octet level-1 + i8 nearest coarse ----
    D = H = W = 7
    vol1 = rs.randint(0, 255, size=(D, H, W, C1)).astype(np.uint8)
    oct1 = build_octet_table_3d(jnp.asarray(vol1))
    sc1 = (0.01 + rs.rand(C1) * 0.03).astype(np.float32)
    volc = rs.randint(-127, 127, size=(D, H, W, Cc)).astype(np.int8)
    ntab = NearestTable(
        jnp.asarray(volc.reshape(-1, Cc)), (D, H, W), 2
    )
    scc = (0.01 + rs.rand(Cc) * 0.03).astype(np.float32)
    size = jnp.asarray([D, H, W])
    pos = jnp.asarray(
        (rs.rand(P, 3) * (np.array([D, H, W]) + 0.5) - 0.5).astype(
            np.float32
        )
    )  # includes out-of-extent points (zeros-outside both paths)

    # ---- projection: u8 full-res src quad rows + PRE-lerped feat tab ----
    rows_s = rs.randint(0, 255, size=(V * P, 4 * 3)).astype(np.uint8)
    w4_s = np.abs(rs.rand(V, 4, P)).astype(np.float32)
    w4_s *= rs.rand(V, 4, P) > 0.1
    s_scale = np.full((3,), 1.0 / 255.0, np.float32)
    feat_pv = (rs.randn(V, P, 32) * 0.3).astype(np.float32)

    # ---- op-by-op reference ----
    f1 = trilinear_octet_rows(oct1, pos, size, scale=jnp.asarray(sc1))
    fc = nearest_rows(ntab, pos, size, scale=jnp.asarray(scc))
    feats_ref = jnp.concatenate([f1, fc], axis=-1)  # (P, 96)
    rf = np.zeros((P, V, C), np.float32)
    for v in range(V):
        for k in range(4):
            rf[:, v, :3] += (
                rows_s[v * P : (v + 1) * P, k * 3 : (k + 1) * 3].astype(
                    np.float32
                )
                * w4_s[v, k, :, None]
            )
    rf[:, :, :3] *= s_scale[None, None, :]
    rf[:, :, 3:] = feat_pv.transpose(1, 0, 2)
    vmask = (rs.rand(V, P) > 0.15).astype(np.float32)
    sig_ok = rs.rand(P) > 0.2
    mean, var = fused_mean_variance(jnp.asarray(rf))
    nvo = jnp.asarray(vmask.T.sum(axis=-1, keepdims=True))
    # folded sigma-feat: elu(f1 @ W[:32] + fc + b)
    Wsf = sf_vars["params"]["dense_0"]["kernel"]
    bsf = sf_vars["params"]["dense_0"]["bias"]
    sigma_feat = jax.nn.elu(f1 @ Wsf[:C1] + fc + bsf)
    sigma_ref = rgbhead.apply(
        rgb_vars, sigma_feat, mean[:, 0], var[:, 0], nvo,
        method=lambda m, *a: m.density(*a),
    )[:, 0]
    sigma_ref = jnp.where(jnp.asarray(sig_ok), sigma_ref, 0.0)
    alpha_ref = 1.0 - jnp.exp(-sigma_ref)
    rgb_ref = rgbhead.apply(
        rgb_vars, jnp.asarray(rf)[:, None], mean[:, None], var[:, None],
        method=lambda m, *a: m.color(*a),
    )[:, 0]
    alive_ref = (alpha_ref > 1e-14) & jnp.asarray(sig_ok)
    rgb_ref = jnp.where(alive_ref[:, None], rgb_ref, 0.0)

    # ---- fused kernel: geom tabs + split proj tabs ----
    grows1, gw1 = octet_rows_and_weights(oct1, pos, size)
    growsc, gwc = nearest_row_and_weight(ntab, pos, size)
    weights = pack_head_weights(head_params, C, fold_nch=C1)
    alpha, rgb = fused_point_stages_tabs(
        (
            (jnp.asarray(rows_s), jnp.asarray(w4_s), jnp.asarray(s_scale)),
            (jnp.asarray(feat_pv.reshape(V * P, 32)),
             jnp.ones((V, 1, P), jnp.float32),
             jnp.ones((32,), jnp.float32)),
        ),
        None, jnp.asarray(vmask), jnp.asarray(sig_ok), weights,
        geom_tabs=(
            (grows1, gw1.T, jnp.asarray(sc1)),
            (growsc, gwc.T, jnp.asarray(scc)),
        ),
        block=256, interpret=True,
    )

    a_ref = np.asarray(alpha_ref)
    a = np.asarray(alpha)
    np.testing.assert_allclose(a, a_ref, atol=0.08, rtol=0.3)
    assert np.abs(a - a_ref).mean() < 5e-3
    alive = a > 1e-14
    alive_r = np.asarray(alive_ref)
    agree = alive == alive_r
    assert (~agree).mean() < 0.01
    r = np.asarray(rgb)[agree.nonzero()[0]]
    r_ref = np.asarray(rgb_ref)[agree.nonzero()[0]]
    np.testing.assert_allclose(r, r_ref, atol=0.08)
    assert np.abs(r - r_ref).mean() < 5e-3
    assert alive[a_ref > 0.05].all()
    assert alive_r[a > 0.05].all()


def test_fused_point_stages_int4_packed_tab():
    """int4 split-pack tab (quantize_image_i4 rows, in-kernel nibble
    unpack): the kernel's quad-lerp over a packed tab == the f32 lerp of
    the dequantized values, via the channel-major [lo | hi] concat. Runs
    the kernel in interpret mode on a minimal 1-view program and checks
    the projection feature it feeds the heads (alpha parity bounds)."""
    from gpnerf_tpu.ops.grid_sample import quantize_image_i4
    from gpnerf_tpu.ops.pallas_point import fused_point_stages_tabs

    rs = np.random.RandomState(7)
    P, V, C = 600, 2, 32

    rgbhead = NeRFRGBHead(in_feat_ch=C - 3)
    rgb_vars = rgbhead.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 2, V, C)), jnp.zeros((2, 2, 64)),
        jnp.zeros((2, 2, V, 1)),
    )
    sf_mlp = MLP((64,), ("elu",))
    F = 96
    sf_vars = sf_mlp.init(jax.random.PRNGKey(1), jnp.zeros((2, F)))
    head_params = {
        "sigmahead": {"out_geometry_fc": sf_vars["params"]},
        "rgbhead": rgb_vars["params"],
    }

    img = (rs.randn(4, P, C) * 0.4).astype(np.float32)  # (taps stacked)
    packed, scale = quantize_image_i4(jnp.asarray(img.transpose(1, 0, 2)))
    packed = np.asarray(packed)  # (P, 4, C/2)
    rows_pk = np.broadcast_to(
        packed.reshape(P, 4 * (C // 2)), (V, P, 4 * (C // 2))
    ).reshape(V * P, -1)
    # f32 oracle: dequantized taps, weighted sum
    q = np.asarray(
        jnp.clip(jnp.round(jnp.asarray(img.transpose(1, 0, 2)) / scale), -7, 7)
    )
    deq = q * np.asarray(scale)  # (P, 4, C)
    w4 = np.abs(rs.rand(V, 4, P)).astype(np.float32)
    rf = np.einsum("pkc,vkp->pvc", deq, w4).astype(np.float32)

    feats = (rs.randn(P, F) * 0.2).astype(np.float32)
    vmask = np.ones((V, P), np.float32)
    sig_ok = np.ones((P,), bool)
    mean, var = fused_mean_variance(jnp.asarray(rf))
    nvo = jnp.asarray(vmask.T.sum(axis=-1, keepdims=True))
    sigma_feat = sf_mlp.apply(sf_vars, jnp.asarray(feats))
    sigma_ref = rgbhead.apply(
        rgb_vars, sigma_feat, mean[:, 0], var[:, 0], nvo,
        method=lambda m, *a: m.density(*a),
    )[:, 0]
    alpha_ref = 1.0 - jnp.exp(-jnp.maximum(sigma_ref, 0.0))

    weights = pack_head_weights(head_params, C)
    alpha, rgb = fused_point_stages_tabs(
        ((jnp.asarray(rows_pk), jnp.asarray(w4), scale),),
        jnp.asarray(feats), jnp.asarray(vmask), jnp.asarray(sig_ok),
        weights, block=256, interpret=True,
    )
    a = np.asarray(alpha)
    a_ref = np.asarray(alpha_ref)
    np.testing.assert_allclose(a, a_ref, atol=0.05, rtol=0.3)
    assert np.abs(a - a_ref).mean() < 5e-3


def test_fused_point_stages_occ_geom_cull():
    """occ_geom: the kernel derives the reference's level-1 occupancy cull
    (`sp_feats > 0`, demo_render.py:294) from geom tab 0's lerped block —
    sigma/rgb must be zeroed exactly where the XLA-side trilinear channel
    sum is <= 0, and the emitted occm mask must equal that predicate."""
    from gpnerf_tpu.ops.grid_sample import (
        NearestTable,
        build_octet_table_3d,
        nearest_row_and_weight,
        nearest_rows,
        octet_rows_and_weights,
        trilinear_octet_rows,
    )
    from gpnerf_tpu.ops.pallas_point import fused_point_stages_tabs

    rs = np.random.RandomState(11)
    P, V = 640, 2
    C1, Cc = 32, 64
    C = 35

    rgbhead = NeRFRGBHead(in_feat_ch=32)
    rgb_vars = rgbhead.init(
        jax.random.PRNGKey(0),
        jnp.zeros((2, 2, V, C)), jnp.zeros((2, 2, 64)),
        jnp.zeros((2, 2, V, 1)),
    )
    sf_mlp = MLP((64,), ("elu",))
    sf_vars = sf_mlp.init(jax.random.PRNGKey(1), jnp.zeros((2, C1 + Cc)))
    head_params = {
        "sigmahead": {"out_geometry_fc": sf_vars["params"]},
        "rgbhead": rgb_vars["params"],
    }

    # level-1 volume with large EMPTY regions so the occupancy cull bites
    D = H = W = 7
    vol1 = rs.randint(0, 255, size=(D, H, W, C1)).astype(np.uint8)
    vol1[(rs.rand(D, H, W) > 0.45)] = 0  # zero sites -> occ <= 0 regions
    oct1 = build_octet_table_3d(jnp.asarray(vol1))
    sc1 = (0.01 + rs.rand(C1) * 0.03).astype(np.float32)
    volc = rs.randint(-127, 127, size=(D, H, W, Cc)).astype(np.int8)
    ntab = NearestTable(jnp.asarray(volc.reshape(-1, Cc)), (D, H, W), 2)
    scc = (0.01 + rs.rand(Cc) * 0.03).astype(np.float32)
    size = jnp.asarray([D, H, W])
    pos = jnp.asarray(
        (rs.rand(P, 3) * (np.array([D, H, W]) + 0.5) - 0.5).astype(
            np.float32
        )
    )

    rows_s = rs.randint(0, 255, size=(V * P, 4 * C)).astype(np.uint8)
    w4_s = np.abs(rs.rand(V, 4, P)).astype(np.float32)
    s_scale = np.full((C,), 1.0 / 255.0, np.float32)
    vmask = np.ones((V, P), np.float32)
    sig_ok = rs.rand(P) > 0.2

    # XLA-side occupancy predicate (query_octet* with_l1_occ semantics)
    f1 = trilinear_octet_rows(oct1, pos, size, scale=jnp.asarray(sc1))
    occ_pred = np.asarray(f1.sum(axis=-1)) > 0

    grows1, gw1 = octet_rows_and_weights(oct1, pos, size)
    growsc, gwc = nearest_row_and_weight(ntab, pos, size)
    weights = pack_head_weights(head_params, C, fold_nch=C1)
    tabs = ((jnp.asarray(rows_s), jnp.asarray(w4_s), jnp.asarray(s_scale)),)
    geom_tabs = (
        (grows1, gw1.T, jnp.asarray(sc1)),
        (growsc, gwc.T, jnp.asarray(scc)),
    )
    alpha0, rgb0 = fused_point_stages_tabs(
        tabs, None, jnp.asarray(vmask), jnp.asarray(sig_ok), weights,
        geom_tabs=geom_tabs, block=256, interpret=True,
    )
    alpha1, rgb1, occm = fused_point_stages_tabs(
        tabs, None, jnp.asarray(vmask), jnp.asarray(sig_ok), weights,
        geom_tabs=geom_tabs, block=256, interpret=True, occ_geom=True,
    )
    occm = np.asarray(occm) > 0.5
    # the mask must be the exact trilinear predicate (modulo bf16 lerp
    # noise exactly at the boundary — require bitwise agreement away from 0)
    margin = np.abs(np.asarray(f1.sum(axis=-1))) > 1e-3
    assert (occm[margin] == occ_pred[margin]).all()
    assert occm.mean() < 0.95  # the cull actually bites on this volume
    a0, a1 = np.asarray(alpha0), np.asarray(alpha1)
    # culled points: zeroed; surviving points: bitwise equal to the
    # occ_geom=False kernel
    assert (a1[~occm] == 0.0).all()
    np.testing.assert_array_equal(a1[occm], a0[occm])
    r0, r1 = np.asarray(rgb0), np.asarray(rgb1)
    assert (r1[~occm] == 0.0).all()
    np.testing.assert_array_equal(r1[occm], r0[occm])
