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
