"""Isosurface extraction (host-side numpy, marching tetrahedra).

Replaces PyMCubes (`mcubes.marching_cubes(cube, th)`,
/root/reference/libs/renders/BaseRender.py:270 and demo_render.py:372) —
neither PyMCubes nor skimage is available in this environment.

Design note (documented deviation): instead of classic marching cubes with
the 256-case connectivity tables, each cell is decomposed into 6 tetrahedra
and each tetrahedron's isosurface patch is derived from first principles
(4 signs -> 0/3/6 triangle vertices). The result is a watertight isosurface
of the same field at the same isolevel with the same edge-interpolated
vertex positions; it tessellates more finely than MC (~2x triangles), which
is irrelevant to the mesh consumers (export / visualization,
libs/evaluators/if_nerf_mesh.py:49-60). Vertices are in index coordinates,
matching mcubes' convention.
"""

from __future__ import annotations

import numpy as np

# cube corners in (x, y, z) offsets, corner id = x + 2*y + 4*z
_CORNERS = np.array(
    [[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)], np.int64
)[:, :]  # (8, 3): id = x + 2y + 4z

# 6-tetrahedra decomposition of the cube around the main diagonal 0-7
# (every tet contains corners 0 and 7; faces between adjacent tets match,
# so the surface is watertight across cells with this uniform split)
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 3, 2, 7],
        [0, 2, 6, 7],
        [0, 6, 4, 7],
        [0, 4, 5, 7],
        [0, 5, 1, 7],
    ],
    np.int64,
)


def _tet_cases():
    """For each of 16 sign patterns (bit c set = corner c above isolevel),
    the list of triangles as pairs of local corner indices (edges) whose
    crossing points form the triangle, oriented arbitrarily."""
    cases = {}
    for mask in range(16):
        above = [bool(mask >> i & 1) for i in range(4)]
        n_above = sum(above)
        if n_above in (0, 4):
            cases[mask] = []
            continue
        if n_above == 1 or n_above == 3:
            lone = above.index(True) if n_above == 1 else above.index(False)
            others = [i for i in range(4) if i != lone]
            e = [(lone, o) for o in others]
            cases[mask] = [(e[0], e[1], e[2])]
        else:  # 2 above, 2 below -> quad -> 2 triangles
            ab = [i for i in range(4) if above[i]]
            be = [i for i in range(4) if not above[i]]
            e00 = (ab[0], be[0])
            e01 = (ab[0], be[1])
            e10 = (ab[1], be[0])
            e11 = (ab[1], be[1])
            cases[mask] = [(e00, e01, e11), (e00, e11, e10)]
    return cases


_CASES = _tet_cases()


def marching_cubes(volume, isolevel):
    """volume: (X, Y, Z) scalar field. Returns (vertices (N, 3) float64 in
    (x, y, z) index coordinates, triangles (M, 3) int64), deduplicating
    shared edge vertices."""
    vol = np.asarray(volume, np.float64)
    X, Y, Z = vol.shape
    if min(X, Y, Z) < 2:
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)

    # per-cell corner values: (C, 8) over active cells only
    corner_vals = np.empty((X - 1, Y - 1, Z - 1, 8), np.float64)
    for c, (cx, cy, cz) in enumerate(_CORNERS):
        corner_vals[..., c] = vol[cx : cx + X - 1, cy : cy + Y - 1, cz : cz + Z - 1]
    above8 = corner_vals > isolevel
    any_above = above8.any(-1)
    all_above = above8.all(-1)
    active = any_above & ~all_above
    if not active.any():
        return np.zeros((0, 3)), np.zeros((0, 3), np.int64)
    cells = np.argwhere(active).astype(np.int64)  # (C, 3) (x, y, z)
    cvals = corner_vals[active]  # (C, 8)
    cabove = above8[active]

    # collect triangles as edge keys; an edge key identifies the global
    # (unordered) corner pair so shared vertices deduplicate
    def corner_key(cell, cid):
        p = cell + _CORNERS[cid]
        return (p[:, 0] * (Y + 1) + p[:, 1]) * (Z + 1) + p[:, 2]

    tri_edge_a = []
    tri_edge_b = []  # parallel lists of (T, 3) corner-key pairs
    tri_cells = []
    for t in range(6):
        tet = _TETS[t]
        tmask = np.zeros(len(cells), np.int64)
        for i in range(4):
            tmask |= cabove[:, tet[i]].astype(np.int64) << i
        for mask in range(1, 15):
            m = tmask == mask
            if not m.any():
                continue
            for tri in _CASES[mask]:
                a_ids = np.array([tet[e[0]] for e in tri], np.int64)
                b_ids = np.array([tet[e[1]] for e in tri], np.int64)
                cell_sel = cells[m]
                ka = np.stack([corner_key(cell_sel, a) for a in a_ids], -1)
                kb = np.stack([corner_key(cell_sel, b) for b in b_ids], -1)
                tri_edge_a.append(ka)
                tri_edge_b.append(kb)
                tri_cells.append(np.stack([cell_sel] * 3, 1))

    ka = np.concatenate(tri_edge_a)  # (T, 3)
    kb = np.concatenate(tri_edge_b)
    # canonicalize edge key as (min, max) pair
    lo = np.minimum(ka, kb)
    hi = np.maximum(ka, kb)
    nkeys = (X + 1) * (Y + 1) * (Z + 1)
    edge_keys = lo.astype(np.int64) * nkeys + hi.astype(np.int64)

    flat = edge_keys.reshape(-1)
    uniq, inv = np.unique(flat, return_inverse=True)
    triangles = inv.reshape(-1, 3)

    # interpolate one vertex per unique edge
    ulo = (uniq // nkeys).astype(np.int64)
    uhi = (uniq % nkeys).astype(np.int64)

    def key_to_pos(k):
        z = k % (Z + 1)
        y = (k // (Z + 1)) % (Y + 1)
        x = k // ((Z + 1) * (Y + 1))
        return np.stack([x, y, z], -1).astype(np.float64)

    pa = key_to_pos(ulo)
    pb = key_to_pos(uhi)
    ia = pa.astype(np.int64)
    ib = pb.astype(np.int64)
    va = vol[ia[:, 0], ia[:, 1], ia[:, 2]]
    vb = vol[ib[:, 0], ib[:, 1], ib[:, 2]]
    denom = vb - va
    tvals = np.where(np.abs(denom) > 1e-30, (isolevel - va) / denom, 0.5)
    tvals = np.clip(tvals, 0.0, 1.0)
    vertices = pa + tvals[:, None] * (pb - pa)

    # drop degenerate triangles (two identical vertices)
    good = (
        (triangles[:, 0] != triangles[:, 1])
        & (triangles[:, 1] != triangles[:, 2])
        & (triangles[:, 0] != triangles[:, 2])
    )
    return vertices, triangles[good]
