"""Isosurface extraction tests: sphere SDF -> mesh with correct radius,
watertightness (every edge shared by exactly 2 triangles), and empty cases."""

import numpy as np

from gpnerf_tpu.ops.marching_cubes import marching_cubes


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
