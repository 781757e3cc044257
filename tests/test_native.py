"""Native C++ host-kernel parity vs the numpy reference implementations."""

import numpy as np
import pytest

from gpnerf_tpu import native
from gpnerf_tpu.data.geometry import _get_near_far_np


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_near_far_matches_numpy():
    rng = np.random.default_rng(0)
    bounds = np.array([[-0.4, 0.0, -0.3], [0.5, 1.8, 0.25]])
    ray_o = np.tile(np.array([[0.1, 0.9, 3.0]]), (5000, 1))
    ray_d = rng.normal(size=(5000, 3))
    ray_d[:, 2] -= 1.5

    n_ref, f_ref, m_ref = _get_near_far_np(bounds, ray_o.copy(), ray_d.copy())
    n_c, f_c, m_c = native.near_far(bounds, ray_o, ray_d)

    np.testing.assert_array_equal(m_c, m_ref)
    np.testing.assert_allclose(n_c, n_ref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(f_c, f_ref, rtol=1e-10, atol=1e-12)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_near_far_neg_direction_sign():
    # ray pointing away from the box: reference yields negative distances
    bounds = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
    ray_o = np.array([[0.0, 0.0, 3.0]])
    ray_d = np.array([[0.0, 0.0, 1.0]])  # away from box
    n_ref, f_ref, m_ref = _get_near_far_np(bounds, ray_o.copy(), ray_d.copy())
    n_c, f_c, m_c = native.near_far(bounds, ray_o, ray_d)
    np.testing.assert_array_equal(m_c, m_ref)
    if m_ref.any():
        np.testing.assert_allclose(n_c, n_ref, atol=1e-12)
        np.testing.assert_allclose(f_c, f_ref, atol=1e-12)


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_zsplat_matches_numpy_splat():
    from gpnerf_tpu.data.synthetic import splat_render

    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3)) * 0.3
    colors = rng.uniform(size=(500, 3)).astype(np.float32)
    K = np.array([[300.0, 0, 64], [0, 300.0, 64], [0, 0, 1]], np.float32)
    R = np.eye(3, dtype=np.float32)
    T = np.array([[0], [0], [3.0]], np.float32)

    img_ref, mask_ref = splat_render(pts, colors, K, R, T, (128, 128), radius=2)

    cam = pts @ R.T + T.reshape(1, 3)
    pix = cam @ K.T
    px = np.round(pix[:, 0] / pix[:, 2]).astype(np.float64)
    py = np.round(pix[:, 1] / pix[:, 2]).astype(np.float64)
    img_c, mask_c = native.zsplat(px, py, cam[:, 2], colors, 2, (128, 128))

    np.testing.assert_array_equal(mask_c, mask_ref)
    # z-fight winners can differ among equal-depth points; compare coverage
    # and the vast majority of pixels
    same = np.isclose(img_c, img_ref, atol=1e-6).all(axis=-1)
    assert same.mean() > 0.98


@pytest.mark.skipif(not native.available(), reason="native lib not built")
def test_bilinear_remap_identity_and_shift():
    rng = np.random.default_rng(2)
    img = rng.uniform(size=(16, 20, 3)).astype(np.float32)
    u, v = np.meshgrid(np.arange(20, dtype=np.float64), np.arange(16, dtype=np.float64))
    out = native.bilinear_remap(img, u, v)
    np.testing.assert_allclose(out, img, atol=1e-6)
    out = native.bilinear_remap(img, u + 0.5, v)
    expect = 0.5 * img[:, :-1] + 0.5 * img[:, 1:]
    np.testing.assert_allclose(out[:, :-1], expect, atol=1e-5)
