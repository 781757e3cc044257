"""Isosurface extraction tests: sphere SDF -> mesh with correct radius,
watertightness (every edge shared by exactly 2 triangles), empty cases,
classic-MC semantics (PyMCubes vertex placement, consistent orientation,
sphere topology/volume), a committed golden oracle, and MC-vs-tetrahedra
cross-validation."""

import numpy as np

from gpnerf_tpu.ops.marching_cubes import (
    _MC_TABLE,
    marching_cubes,
    marching_tetrahedra,
)


def test_sphere_isosurface():
    n = 24
    g = np.arange(n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2
    vol = 8.0 - np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2)
    verts, tris = marching_cubes(vol, 0.0)
    assert len(verts) > 100 and len(tris) > 100
    r = np.linalg.norm(verts - c, axis=1)
    np.testing.assert_allclose(r.mean(), 8.0, atol=0.1)
    assert r.std() < 0.1
    assert tris.min() >= 0 and tris.max() < len(verts)


def test_watertight():
    n = 12
    g = np.arange(n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    vol = 4.0 - np.sqrt((x - 5.5) ** 2 + (y - 5.5) ** 2 + (z - 5.5) ** 2)
    verts, tris = marching_cubes(vol, 0.0)
    edges = {}
    for t in tris:
        for a, b in ((0, 1), (1, 2), (2, 0)):
            key = (min(t[a], t[b]), max(t[a], t[b]))
            edges[key] = edges.get(key, 0) + 1
    counts = np.array(list(edges.values()))
    assert (counts == 2).all(), f"non-manifold edges: {(counts != 2).sum()}"


def test_empty_and_full():
    vol = np.zeros((8, 8, 8))
    v, t = marching_cubes(vol, 0.5)
    assert len(v) == 0 and len(t) == 0
    v, t = marching_cubes(np.ones((8, 8, 8)), 0.5)
    assert len(v) == 0 and len(t) == 0


def _sphere_field(n=24, r=8.0):
    g = np.arange(n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2
    return r - np.sqrt((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2), c, r


def test_classic_mc_table_shape():
    """The derived 256-case table has classic-MC structure: empty only for
    the two trivial cases, at most 5 triangles per case (the Lorensen-Cline
    maximum), and complementary cases cut the same edge set."""
    assert len(_MC_TABLE) == 256
    assert _MC_TABLE[0] == [] and _MC_TABLE[255] == []
    assert all(_MC_TABLE[c] for c in range(1, 255))
    assert max(len(t) for t in _MC_TABLE) == 5

    def edge_set(case):
        return frozenset(e for tri in _MC_TABLE[case] for e in tri)

    for case in range(256):
        assert edge_set(case) == edge_set(255 - case)


def test_classic_mc_vertex_placement_and_orientation():
    """PyMCubes parity semantics (VERDICT r4 #7): one vertex per cut GRID
    edge at the linear interpolation t = (iso - va) / (vb - va)
    (BaseRender.py:270 / demo_render.py:372 consume mcubes' output), every
    undirected triangle edge shared by exactly two triangles with OPPOSITE
    directions (closed, consistently oriented), sphere topology (Euler
    characteristic 2), and positive enclosed volume matching the ball."""
    vol, c, r = _sphere_field()
    verts, tris = marching_cubes(vol, 0.0)

    # vertex placement: on exactly one grid edge (one fractional coord),
    # and recomputing the lerp from the field reproduces the coordinate
    frac = verts - np.floor(verts)
    frac_axes = (frac > 1e-12) & (frac < 1 - 1e-12)
    assert (frac_axes.sum(axis=1) <= 1).all()
    for p, ax in zip(verts[:200], frac_axes[:200]):
        if not ax.any():
            continue
        a = np.floor(p).astype(int)
        b = a.copy()
        b[np.argmax(ax)] += 1
        va, vb = vol[tuple(a)], vol[tuple(b)]
        t_expect = (0.0 - va) / (vb - va)
        np.testing.assert_allclose(p[np.argmax(ax)], a[np.argmax(ax)] + t_expect,
                                   atol=1e-12)

    # closed + consistently oriented
    dir_edges = {}
    for t in tris:
        for i in range(3):
            k = (t[i], t[(i + 1) % 3])
            dir_edges[k] = dir_edges.get(k, 0) + 1
    assert all(
        cnt == 1 and dir_edges.get((b, a), 0) == 1
        for (a, b), cnt in dir_edges.items()
    )
    n_edges = len(dir_edges) // 2
    assert len(verts) - n_edges + len(tris) == 2  # sphere topology

    # outward orientation: positive signed volume ~ ball volume
    signed = np.einsum(
        "ij,ij->i", verts[tris[:, 0]],
        np.cross(verts[tris[:, 1]], verts[tris[:, 2]]),
    ).sum() / 6.0
    ball = 4.0 / 3.0 * np.pi * r ** 3
    assert abs(signed - ball) / ball < 0.02, signed


def test_mc_vs_tetrahedra_cross_validation():
    """Both extractors tessellate the SAME isosurface: identical vertex
    radii statistics on the sphere and surface areas within 2%."""

    def area(verts, tris):
        n = np.cross(
            verts[tris[:, 1]] - verts[tris[:, 0]],
            verts[tris[:, 2]] - verts[tris[:, 0]],
        )
        return 0.5 * np.linalg.norm(n, axis=1).sum()

    vol, c, r = _sphere_field()
    v_mc, t_mc = marching_cubes(vol, 0.0)
    v_mt, t_mt = marching_tetrahedra(vol, 0.0)
    assert len(t_mt) > 1.5 * len(t_mc)  # tets tessellate finer
    r_mc = np.linalg.norm(v_mc - c, axis=1)
    r_mt = np.linalg.norm(v_mt - c, axis=1)
    np.testing.assert_allclose(r_mc.mean(), r_mt.mean(), atol=0.05)
    a_mc, a_mt = area(v_mc, t_mc), area(v_mt, t_mt)
    assert abs(a_mc - a_mt) / a_mt < 0.02, (a_mc, a_mt)


def test_mc_golden_oracle():
    """Committed golden values: a fixed smoothed-noise 5^3 field must
    reproduce the exact mesh (regression guard for the derived table)."""
    rng = np.random.RandomState(7)
    vol = rng.rand(5, 5, 5)
    from scipy.ndimage import gaussian_filter

    vol = gaussian_filter(vol, 0.8)
    v, t = marching_cubes(vol, 0.5)
    assert (len(v), len(t)) == (75, 104)
    np.testing.assert_allclose(
        v.sum(axis=0), [167.75426317, 119.66308757, 158.75889663], atol=1e-6
    )
    assert int(t.sum()) == 11359
    np.testing.assert_allclose(
        v[:3],
        [
            [0.0, 0.0, 1.38215062],
            [0.0, 0.1727027, 2.0],
            [0.0, 0.51930957, 3.0],
        ],
        atol=1e-6,
    )
    np.testing.assert_array_equal(t[:3], [[25, 28, 11], [6, 5, 19], [6, 19, 22]])
