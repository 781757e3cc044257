"""Host-built sparse pyramid (data/sparse_host.py) vs the device-side
builder (ops/sparse_conv.py): same active sets, same conv results.

Row ORDER differs by construction (host rows are flat-index sorted; the
device level-0 keeps input order), so the invariant is checked where it
matters: the scattered dense feature volumes and the occupancy field after a
full SparseConvNet pass with shared weights must match exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpnerf_tpu.data.sparse_host import build_host_pyramid
from gpnerf_tpu.models.sparse_net import SparseConvNet, build_grid_pyramid, occupancy_volume
from gpnerf_tpu.ops.sparse_conv import SparseLevel, derive_level_tables, scatter_dense

SHAPE = (32, 64, 64)
SITE_CAP = 1024
LEVEL_CAPS = (4096, 4096, 2048, 1024)


def _random_coords(seed, n=700):
    rng = np.random.default_rng(seed)
    # clustered cloud with duplicates (multiple vertices per voxel)
    base = rng.integers(2, 28, size=(n, 3))
    base[:, 1:] = rng.integers(4, 60, size=(n, 2))
    dup = rng.integers(0, n, size=n // 10)
    base[dup] = base[(dup * 7) % n]
    return base.astype(np.int32)


def _device_levels(coord):
    cap = SITE_CAP
    S = len(coord)
    oob = jnp.asarray(SHAPE, jnp.int32)
    coords = jnp.full((cap, 3), oob, jnp.int32).at[:S].set(jnp.asarray(coord))
    valid = jnp.arange(cap) < S
    grids, overflows = build_grid_pyramid(coords, valid, SHAPE, LEVEL_CAPS)
    vertex_rows = jnp.where(grids[0].valid, jnp.arange(cap), -1)
    return derive_level_tables(grids), vertex_rows, overflows


def _host_levels(coord):
    hp = build_host_pyramid(coord, SHAPE, SITE_CAP, LEVEL_CAPS)
    shapes = [tuple(v >> i for v in SHAPE) for i in range(5)]
    levels = [
        SparseLevel(
            jnp.asarray(hp[f"lvl{i}_coords"]),
            jnp.asarray(hp[f"lvl{i}_valid"]),
            jnp.asarray(hp[f"lvl{i}_nbr"]),
            jnp.asarray(hp[f"lvl{i}_down"]) if i >= 1 else None,
            shapes[i],
        )
        for i in range(5)
    ]
    return levels, jnp.asarray(hp["vertex_rows"]), hp["pyramid_overflows"]


def test_active_sets_match():
    coord = _random_coords(0)
    dev, _, dev_ov = _device_levels(coord)
    host, _, host_ov = _host_levels(coord)
    assert int(jnp.asarray(dev_ov).max()) == 0 and host_ov.max() == 0
    for i in range(5):
        dset = {
            tuple(c) for c, v in zip(np.asarray(dev[i].coords), np.asarray(dev[i].valid)) if v
        }
        hset = {
            tuple(c) for c, v in zip(np.asarray(host[i].coords), np.asarray(host[i].valid)) if v
        }
        assert dset == hset, f"level {i} active sets differ"
    # strided levels are flat-sorted on both paths -> identical row order
    for i in range(1, 5):
        nv = int(np.asarray(host[i].valid).sum())
        np.testing.assert_array_equal(
            np.asarray(dev[i].coords)[:nv], np.asarray(host[i].coords)[:nv]
        )


def test_conv_results_match():
    coord = _random_coords(1)
    dev, vr_dev, _ = _device_levels(coord)
    host, vr_host, _ = _host_levels(coord)

    S = len(coord)
    rng = np.random.default_rng(2)
    codes = jnp.asarray(rng.standard_normal((S, 8)).astype(np.float32))

    net = SparseConvNet(n_layers=4, out_dim=(8, 8, 8, 8))

    def run(levels, vertex_rows):
        safe = jnp.maximum(vertex_rows, 0)
        code = jnp.where(
            (vertex_rows >= 0)[:, None], codes[jnp.minimum(safe, S - 1)], 0.0
        )
        variables = net.init(
            jax.random.PRNGKey(0), code, levels, train=False,
            method=lambda m, *a, **k: m.features(*a, **k),
        )
        feats = net.apply(
            variables, code, levels, train=False,
            method=lambda m, *a, **k: m.features(*a, **k),
        )
        denses = [scatter_dense(feats[i], levels[i + 1]) for i in range(4)]
        occ = occupancy_volume(feats, levels)
        return denses, occ

    d_dev, occ_dev = run(dev, vr_dev)
    d_host, occ_host = run(host, vr_host)
    for a, b in zip(d_dev, d_host):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(occ_dev), np.asarray(occ_host), rtol=1e-5, atol=1e-5)
