"""Sparse conv parity vs dense torch conv3d oracles.

A sparse conv on an active set equals a dense conv on the zero-padded
densified volume, evaluated at the active (subm) / generated (strided)
output sites — the oracle used here.
"""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from gpnerf_tpu.ops.sparse_conv import (
    build_sparse_grid,
    scatter_channel_sum,
    scatter_dense,
    stride_active_set,
    stride_conv3x3,
    subm_conv3x3,
    trilinear_sparse_gather,
)

SHAPE = (16, 16, 16)
CAP = 128


def _random_active_set(rng, n, shape=SHAPE, cap=CAP):
    coords = rng.integers(0, np.asarray(shape), size=(n, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    n = len(coords)
    pad = np.full((cap - n, 3), -1, np.int32)
    coords = np.concatenate([coords, pad], axis=0)
    valid = np.zeros((cap,), bool)
    valid[:n] = True
    return coords, valid, n


def _torch_weight(weight_kcc):
    """(27, Ci, Co) -> torch (Co, Ci, 3, 3, 3)."""
    k, ci, co = weight_kcc.shape
    w = weight_kcc.reshape(3, 3, 3, ci, co)
    return torch.from_numpy(np.ascontiguousarray(w.transpose(4, 3, 0, 1, 2)))


def test_subm_conv_matches_dense_conv_at_active_sites():
    rng = np.random.default_rng(0)
    coords, valid, n = _random_active_set(rng, 60)
    feats = rng.standard_normal((CAP, 8)).astype(np.float32)
    feats[~valid] = 0
    weight = rng.standard_normal((27, 8, 16)).astype(np.float32) * 0.1

    grid = build_sparse_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    out = np.asarray(subm_conv3x3(jnp.asarray(feats), grid, jnp.asarray(weight)))

    dense = np.asarray(scatter_dense(jnp.asarray(feats), grid))  # (D,H,W,C)
    dense_t = torch.from_numpy(dense.transpose(3, 0, 1, 2))[None]
    ref = F.conv3d(dense_t, _torch_weight(weight), padding=1)[0].numpy()
    for i in range(n):
        d, h, w = coords[i]
        np.testing.assert_allclose(out[i], ref[:, d, h, w], rtol=1e-4, atol=1e-4)
    assert np.all(out[~valid] == 0)


def test_stride_active_set_matches_maxpool_oracle():
    rng = np.random.default_rng(1)
    coords, valid, n = _random_active_set(rng, 40)
    grid = build_sparse_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    out_grid, overflow = stride_active_set(grid, out_cap=CAP)
    assert int(overflow) == 0

    occ = np.zeros(SHAPE, np.float32)
    occ[coords[valid][:, 0], coords[valid][:, 1], coords[valid][:, 2]] = 1
    pooled = F.max_pool3d(
        torch.from_numpy(occ)[None, None], kernel_size=3, stride=2, padding=1
    )[0, 0].numpy()
    expect = set(map(tuple, np.argwhere(pooled > 0)))
    got_coords = np.asarray(out_grid.coords)
    got_valid = np.asarray(out_grid.valid)
    got = set(map(tuple, got_coords[got_valid]))
    assert got == expect


def test_stride_conv_matches_dense_strided_conv():
    rng = np.random.default_rng(2)
    coords, valid, n = _random_active_set(rng, 50)
    feats = rng.standard_normal((CAP, 8)).astype(np.float32)
    feats[~valid] = 0
    weight = rng.standard_normal((27, 8, 4)).astype(np.float32) * 0.1

    grid = build_sparse_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)
    out_grid, _ = stride_active_set(grid, out_cap=CAP)
    out = np.asarray(
        stride_conv3x3(jnp.asarray(feats), grid, out_grid, jnp.asarray(weight))
    )

    dense = np.asarray(scatter_dense(jnp.asarray(feats), grid))
    dense_t = torch.from_numpy(dense.transpose(3, 0, 1, 2))[None]
    ref = F.conv3d(dense_t, _torch_weight(weight), stride=2, padding=1)[0].numpy()

    oc = np.asarray(out_grid.coords)
    ov = np.asarray(out_grid.valid)
    for i in np.flatnonzero(ov):
        d, h, w = oc[i]
        np.testing.assert_allclose(out[i], ref[:, d, h, w], rtol=1e-4, atol=1e-4)


def test_trilinear_sparse_gather_matches_grid_sample():
    rng = np.random.default_rng(3)
    coords, valid, n = _random_active_set(rng, 70)
    feats = rng.standard_normal((CAP, 8)).astype(np.float32)
    feats[~valid] = 0
    grid = build_sparse_grid(jnp.asarray(coords), jnp.asarray(valid), SHAPE)

    # query points in normalized [-1,1] (reference convention), then map to
    # absolute voxel units the way the renderer does
    g = rng.uniform(-1.1, 1.1, size=(200, 3)).astype(np.float32)  # xyz = whd
    D, H, W = SHAPE
    sizes = np.array([W, H, D], np.float32)
    pos_whd = (g + 1.0) / 2.0 * (sizes - 1.0)
    pos_dhw = pos_whd[:, ::-1].copy()

    out = np.asarray(trilinear_sparse_gather(jnp.asarray(feats), grid, jnp.asarray(pos_dhw)))

    dense = np.asarray(scatter_dense(jnp.asarray(feats), grid))  # (D,H,W,C)
    vol_t = torch.from_numpy(dense.transpose(3, 0, 1, 2))[None]  # (1,C,D,H,W)
    grid_t = torch.from_numpy(g)[None, None, None]  # (1,1,1,P,3) xyz order
    ref = (
        F.grid_sample(vol_t, grid_t, padding_mode="zeros", align_corners=True)[0, :, 0, 0]
        .numpy()
        .T
    )
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_duplicate_coords_deduplicated_lowest_wins():
    coords = np.array([[1, 1, 1], [2, 2, 2], [1, 1, 1], [-1, -1, -1]], np.int32)
    valid = np.array([True, True, True, False])
    grid = build_sparse_grid(jnp.asarray(coords), jnp.asarray(valid), (4, 4, 4))
    v = np.asarray(grid.valid)
    assert list(v) == [True, True, False, False]
    iv = np.asarray(grid.index_vol)
    assert iv[1, 1, 1] == 0 and iv[2, 2, 2] == 1
    assert (iv >= 0).sum() == 2


def test_scatter_channel_sum():
    coords = np.array([[0, 0, 0], [1, 2, 3]], np.int32)
    coords = np.concatenate([coords, np.full((2, 3), -1, np.int32)])
    valid = np.array([True, True, False, False])
    feats = np.array([[1.0, 2.0], [3.0, -1.0], [9.0, 9.0], [9.0, 9.0]], np.float32)
    grid = build_sparse_grid(jnp.asarray(coords), jnp.asarray(valid), (4, 4, 4))
    vol = np.asarray(scatter_channel_sum(jnp.asarray(feats), grid))
    assert vol[0, 0, 0] == 3.0
    assert vol[1, 2, 3] == 2.0
    assert vol.sum() == 5.0


def test_dense_eval_matches_rows_path():
    """EVAL dense-convolution stack (models.sparse_net.sparse_net_dense_eval)
    reproduces the table-driven rows path exactly: a SubM conv is a dense
    conv over the zero-filled volume re-masked to the active set; the
    strided conv is a dense stride-2 conv masked to the strided set; eval
    BN is the running-stats affine."""
    import jax

    from gpnerf_tpu.data.sparse_host import build_host_pyramid
    from gpnerf_tpu.models.sparse_net import (
        SparseConvNet,
        sparse_net_dense_eval,
    )
    from gpnerf_tpu.ops.sparse_conv import SparseLevel, scatter_dense

    rng = np.random.default_rng(0)
    shape = (32, 32, 32)
    caps = [512, 1024, 512, 256, 128]
    coord = rng.integers(2, 30, (400, 3))
    host = build_host_pyramid(coord, shape, caps[0], caps[1:])
    shapes = [tuple(s >> i for s in shape) for i in range(5)]
    levels = [
        SparseLevel(
            jnp.asarray(host[f"lvl{i}_coords"], jnp.int32),
            jnp.asarray(host[f"lvl{i}_valid"]),
            jnp.asarray(host[f"lvl{i}_nbr"], jnp.int32),
            None if i == 0 else jnp.asarray(host[f"lvl{i}_down"], jnp.int32),
            shapes[i],
        )
        for i in range(5)
    ]
    net = SparseConvNet(n_layers=4, out_dim=(8, 8, 8, 8))
    code = jnp.asarray(rng.standard_normal((caps[0], 16)).astype(np.float32))
    code = jnp.where(jnp.asarray(host["lvl0_valid"])[:, None], code, 0.0)
    variables = net.init(
        jax.random.PRNGKey(0), code, levels, train=False, method="features"
    )
    rows = net.apply(variables, code, levels, train=False, method="features")
    dense_rows = [scatter_dense(rows[i], levels[i + 1]) for i in range(4)]
    vols = sparse_net_dense_eval(
        variables["params"], variables.get("batch_stats", {}), code, levels
    )
    for i, (a, b) in enumerate(zip(dense_rows, vols)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"level {i}",
        )
