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
