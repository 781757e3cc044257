"""TPU-native sparse 3D convolution (the spconv equivalent).

The reference's geometry volume is built by spconv 1.2.1 (CUDA):
`SparseConvTensor` + `SubMConv3d` (submanifold, k=3) + `SparseConv3d`
(k=3, s=2, p=1) + `.dense()` + `F.grid_sample` queries
(/root/reference/libs/nerfheads/networks/SparseConvNet.py:21-143).

This module re-designs that stack for TPU/XLA with static shapes:

  * The active set is a padded (CAP, 3) int32 coord list + (CAP,) validity
    mask. CAP is a config capacity (the SMPL body occupies <= 6890 voxels at
    5 mm, and strided levels shrink).
  * The "voxel hash" is a dense int32 index volume (voxel -> row id, -1 if
    empty), built by scatter. At 5 mm resolution and the default
    max_out_sh this costs ~60 MB HBM, far cheaper than real hashing and
    O(1)-gatherable.
  * A conv is: one OFFSET-MAJOR (27, N) zero-row-padded gather of the
    neighbor rows -> a double-contraction einsum ('okc,ocd->kd') on the MXU
    -> rows stay in place (submanifold) or land on a new active set
    (strided). Offset-major layout measured 2x faster than the site-major
    (N, 27, Cin) gather + reshape + dot on v5e (XLA assigns the site-major
    reshape a relayout copy); the appended zero row replaces the idx==-1
    `where` pass.
  * Dense feature volumes are never materialized: trilinear queries gather
    the 8 corner rows through the index volume and lerp, with inactive
    corners contributing zero — numerically identical to the reference's
    `.dense()` + grid_sample(zeros padding, align_corners=True).

Deviation from spconv noted for the parity audit: duplicate input coords
(multiple SMPL vertices in one 5 mm voxel) are deduplicated deterministically
(lowest row id wins); spconv's hash build leaves the winner unspecified.

Weight layout: (K^3, Cin, Cout) with tap index k = ((kd*3)+kh)*3+kw and
offset (kd-1, kh-1, kw-1); out[o] = sum_k W[k] @ x[o + offset(k)] for
submanifold and out[o] = sum_k W[k] @ x[2o + offset(k)] for the strided conv
(k=3, s=2, p=1) — matching torch convention for checkpoint interop.
"""

from __future__ import annotations

import itertools
from typing import NamedTuple, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


class SparseLevel(NamedTuple):
    """A static-shape sparse voxel level with PRECOMPUTED conv tables.

    The tables are pure geometry (functions of the frame's voxel coords) and
    are built on the HOST (gpnerf_tpu/data/sparse_host.py) inside the
    DataLoader workers — on a networked TPU runtime the round-1 device-side
    pyramid build (scatter/nonzero per level) cost ~50 ms/frame of op
    dispatch alone. A device-side fallback (`derive_level_tables`) exists
    for batches without host tables.

    coords: (CAP, 3) int32 dhw voxel coords (padding rows hold the level
      shape so scatters drop them).
    valid: (CAP,) bool.
    nbr: (CAP, 27) int32 same-level 3^3 neighbor row ids (-1 absent) — the
      submanifold conv rulebook.
    down: (CAP, 27) int32 row ids into the PARENT (finer) level at
      2*o + offset — the strided conv rulebook; None at level 0.
    shape: static (D, H, W) of the level's voxel grid.
    """

    coords: jnp.ndarray
    valid: jnp.ndarray
    nbr: jnp.ndarray
    down: object  # jnp.ndarray or None at level 0
    shape: Tuple[int, int, int]


class SparseGrid(NamedTuple):
    """A static-shape sparse voxel level.

    coords: (CAP, 3) int32 dhw voxel coords (padding rows hold out-of-range
      coords so scatters drop them).
    valid: (CAP,) bool.
    index_vol: (D, H, W) int32 voxel -> row id, -1 where empty.
    shape: static (D, H, W) of the level's voxel grid.
    """

    coords: jnp.ndarray
    valid: jnp.ndarray
    index_vol: jnp.ndarray
    shape: Tuple[int, int, int]


_OFFSETS_3 = np.array(
    list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.int32
)  # (27, 3) in dhw order, tap k matches the docstring layout


def build_sparse_grid(coords, valid, shape: Sequence[int]) -> SparseGrid:
    """Build the index volume for an active set and deduplicate coords.

    Duplicate coords are resolved lowest-row-id-wins: the scatter uses `min`
    so the result is deterministic; losing rows are marked invalid.
    """
    D, H, W = shape
    cap = coords.shape[0]
    row_ids = jnp.arange(cap, dtype=jnp.int32)
    # push invalid rows out of range so the scatter drops them; NB: negative
    # sentinels would WRAP (numpy indexing), so use an out-of-bounds positive
    oob = jnp.asarray([D, H, W], dtype=jnp.int32)
    safe_coords = jnp.where(valid[:, None], coords, oob)
    index_vol = jnp.full((D, H, W), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    index_vol = index_vol.at[
        safe_coords[:, 0], safe_coords[:, 1], safe_coords[:, 2]
    ].min(row_ids, mode="drop")
    # winners: rows whose id is stored at their own coord
    clamped = jnp.clip(coords, 0, jnp.asarray([D - 1, H - 1, W - 1]))
    stored = index_vol[clamped[:, 0], clamped[:, 1], clamped[:, 2]]
    valid = valid & (stored == row_ids)
    index_vol = jnp.where(
        index_vol == jnp.iinfo(jnp.int32).max, jnp.int32(-1), index_vol
    )
    return SparseGrid(coords, valid, index_vol, (D, H, W))


def _lookup(index_vol, coords, shape):
    """Index-volume lookup with out-of-bounds -> -1. coords (..., 3)."""
    D, H, W = shape
    inb = (
        (coords[..., 0] >= 0)
        & (coords[..., 0] < D)
        & (coords[..., 1] >= 0)
        & (coords[..., 1] < H)
        & (coords[..., 2] >= 0)
        & (coords[..., 2] < W)
    )
    c = jnp.clip(coords, 0, jnp.asarray([D - 1, H - 1, W - 1], dtype=coords.dtype))
    idx = index_vol[c[..., 0], c[..., 1], c[..., 2]]
    return jnp.where(inb, idx, jnp.int32(-1))


def _gather_rows(feats, idx):
    """Gather feature rows; idx == -1 -> zero row. idx (...,), feats (N, C)."""
    safe = jnp.maximum(idx, 0)
    rows = feats[safe]
    return jnp.where((idx >= 0)[..., None], rows, jnp.zeros_like(rows))


def _conv_gather_mm(feats, idx, valid, weight, compute_dtype):
    """Shared conv body: offset-major zero-row-padded neighbor gather +
    double-contraction einsum. feats (N, Cin), idx (CAP, 27) row ids (-1
    absent), weight (27, Cin, Cout) -> (CAP, Cout) f32, zeroed off-valid."""
    if compute_dtype is not None:
        feats = feats.astype(compute_dtype)  # cast BEFORE gather: half traffic
        weight = weight.astype(compute_dtype)
    n = feats.shape[0]
    featsz = jnp.concatenate(
        [feats, jnp.zeros((1, feats.shape[1]), feats.dtype)], axis=0
    )
    idx_t = jnp.where(idx >= 0, idx, n).T  # (27, CAP); -1 -> the zero row
    g = featsz[idx_t]  # (27, CAP, Cin)
    out = jnp.einsum(
        "okc,ocd->kd", g, weight, preferred_element_type=jnp.float32
    )
    return jnp.where(valid[:, None], out, 0.0)


def subm_conv3x3(feats, grid: SparseGrid, weight, *, compute_dtype=None):
    """Submanifold 3x3x3 conv: output only at existing active sites
    (spconv.SubMConv3d semantics, SparseConvNet.py:33-49).

    feats: (CAP, Cin). weight: (27, Cin, Cout). Returns (CAP, Cout).
    """
    nbr_coords = grid.coords[:, None, :] + jnp.asarray(_OFFSETS_3)  # (CAP,27,3)
    nbr_idx = _lookup(grid.index_vol, nbr_coords, grid.shape)  # (CAP, 27)
    return _conv_gather_mm(feats, nbr_idx, grid.valid, weight, compute_dtype)


def stride_active_set(grid: SparseGrid, out_cap: int):
    """Generate the strided-conv (k=3, s=2, p=1) output active set.

    An output site o is active iff its receptive field [2o-1, 2o+1] contains
    an active input. Per dim the candidates for input coord c are
    {c//2, (c+1)//2}; the 8 combinations are scattered into an occupancy
    volume and compacted to `out_cap` rows with jnp.nonzero(size=...).

    Returns (out_grid, overflow_count). Output order is flat-index sorted
    (deterministic).
    """
    D, H, W = grid.shape
    oD, oH, oW = D // 2, H // 2, W // 2
    lo = grid.coords // 2
    hi = (grid.coords + 1) // 2
    occ = jnp.zeros((oD, oH, oW), dtype=jnp.int32)
    for sel in itertools.product((0, 1), repeat=3):
        cand = jnp.stack(
            [
                (hi if sel[0] else lo)[:, 0],
                (hi if sel[1] else lo)[:, 1],
                (hi if sel[2] else lo)[:, 2],
            ],
            axis=-1,
        )
        inb = (
            grid.valid
            & (cand[:, 0] < oD)
            & (cand[:, 1] < oH)
            & (cand[:, 2] < oW)
            & jnp.all(cand >= 0, axis=-1)
        )
        safe = jnp.where(inb[:, None], cand, jnp.asarray([oD, oH, oW]))
        occ = occ.at[safe[:, 0], safe[:, 1], safe[:, 2]].set(1, mode="drop")
    flat = occ.reshape(-1)
    total = flat.sum()
    # cumsum + scatter compaction (sized jnp.nonzero lowers through a full
    # sort on TPU); ascending flat order, -1-filled tail, like before
    pos = jnp.cumsum(flat) - flat
    tgt = jnp.where((flat > 0) & (pos < out_cap), pos, out_cap)
    flat_idx = (
        jnp.full((out_cap,), -1, jnp.int32)
        .at[tgt]
        .set(jnp.arange(flat.shape[0], dtype=jnp.int32), mode="drop")
    )
    out_valid = jnp.arange(out_cap, dtype=jnp.int32) < total
    safe_idx = jnp.maximum(flat_idx, 0)
    od = safe_idx // (oH * oW)
    oh = (safe_idx // oW) % oH
    ow = safe_idx % oW
    out_coords = jnp.where(
        out_valid[:, None],
        jnp.stack([od, oh, ow], axis=-1).astype(jnp.int32),
        jnp.asarray([oD, oH, oW], dtype=jnp.int32),
    )
    out_grid = build_sparse_grid(out_coords, out_valid, (oD, oH, oW))
    overflow = jnp.maximum(total - out_cap, 0)
    return out_grid, overflow


def stride_conv3x3(feats, in_grid: SparseGrid, out_grid: SparseGrid, weight,
                   *, compute_dtype=None):
    """Strided sparse conv k=3 s=2 p=1 (spconv.SparseConv3d semantics,
    SparseConvNet.py:78-87): out[o] = sum_k W[k] @ x[2o + offset(k)].

    feats: (CAP_in, Cin). weight: (27, Cin, Cout). Returns (CAP_out, Cout).
    """
    centers = out_grid.coords * 2  # input-level coords
    nbr_coords = centers[:, None, :] + jnp.asarray(_OFFSETS_3)
    nbr_idx = _lookup(in_grid.index_vol, nbr_coords, in_grid.shape)
    return _conv_gather_mm(
        feats, nbr_idx, out_grid.valid, weight, compute_dtype
    )


def subm_conv_tbl(feats, level: SparseLevel, weight, *, compute_dtype=None):
    """Submanifold 3x3x3 conv through the precomputed neighbor table
    (same semantics as `subm_conv3x3`; one gather + one MXU matmul)."""
    return _conv_gather_mm(feats, level.nbr, level.valid, weight, compute_dtype)


def stride_conv_tbl(feats_in, level: SparseLevel, weight, *, compute_dtype=None):
    """Strided sparse conv k=3 s=2 p=1 through `level.down` (same semantics
    as `stride_conv3x3`)."""
    return _conv_gather_mm(
        feats_in, level.down, level.valid, weight, compute_dtype
    )


def derive_level_tables(grids) -> list:
    """Device-side fallback: SparseLevels (with conv tables) from a
    `build_grid_pyramid` result — one lookup per table instead of one per
    conv. Used when the batch carries no host-built tables."""
    offsets = jnp.asarray(_OFFSETS_3)
    levels = []
    for i, g in enumerate(grids):
        nbr_coords = g.coords[:, None, :] + offsets
        nbr = _lookup(g.index_vol, nbr_coords, g.shape)
        nbr = jnp.where(g.valid[:, None], nbr, -1)
        down = None
        if i >= 1:
            centers = g.coords * 2
            dn_coords = centers[:, None, :] + offsets
            down = _lookup(grids[i - 1].index_vol, dn_coords, grids[i - 1].shape)
            down = jnp.where(g.valid[:, None], down, -1)
        levels.append(SparseLevel(g.coords, g.valid, nbr, down, g.shape))
    return levels


def build_index_volume(coords, valid, shape):
    """Dense voxel -> row-id volume (-1 empty) for a level's active rows.
    Level coords are unique by construction (host pyramid / stride dedup),
    so a plain scatter suffices. A few small scatters per frame — cheap in
    a jitted step, and the sparse trilinear query through it avoids
    materializing (and differentiating through) dense feature volumes."""
    D, H, W = shape
    cap = coords.shape[0]
    safe = jnp.where(valid[:, None], coords, jnp.asarray([D, H, W], coords.dtype))
    vol = jnp.full((D, H, W), -1, jnp.int32)
    return vol.at[safe[:, 0], safe[:, 1], safe[:, 2]].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop"
    )


def trilinear_sparse_rows(feats, index_vol, shape, pos, dyn_size=None):
    """Trilinear query of sparse rows through an index volume (zeros
    padding; same semantics as trilinear_sparse_gather, free of the
    SparseGrid wrapper)."""
    d0 = jnp.floor(pos)
    w1 = pos - d0
    w0 = 1.0 - w1
    base = d0.astype(jnp.int32)
    size = (
        jnp.asarray(shape, jnp.int32) if dyn_size is None
        else dyn_size.astype(jnp.int32)
    )
    out = 0.0
    for sel in itertools.product((0, 1), repeat=3):
        corner = base + jnp.asarray(sel, dtype=jnp.int32)
        inb = jnp.all((corner >= 0) & (corner < size), axis=-1)
        idx = _lookup(index_vol, corner, shape)
        idx = jnp.where(inb, idx, jnp.int32(-1))
        w = (
            (w1[:, 0] if sel[0] else w0[:, 0])
            * (w1[:, 1] if sel[1] else w0[:, 1])
            * (w1[:, 2] if sel[2] else w0[:, 2])
        )
        out = out + _gather_rows(feats, idx) * w[:, None]
    return out


def trilinear_sparse_gather(feats, grid: SparseGrid, pos, dyn_size=None):
    """Trilinear query of a sparse level at absolute voxel positions.

    Numerically equivalent to the reference's `.dense()` +
    F.grid_sample(zeros padding, align_corners=True)
    (SparseConvNet.py:105-124): inactive/out-of-bounds corners contribute 0.

    Args:
      feats: (CAP, C) level features.
      pos: (P, 3) dhw positions in this level's voxel units (already
        unnormalized; the caller applies the reference's out_sh -> [-1, 1]
        -> (size-1) mapping).
      dyn_size: optional (3,) per-frame valid extent (dhw); taps at or
        beyond it are masked (zeros padding against the *dynamic* volume
        rather than the static buffer).

    Returns: (P, C).
    """
    d0 = jnp.floor(pos)
    w1 = pos - d0
    w0 = 1.0 - w1
    base = d0.astype(jnp.int32)

    if dyn_size is None:
        size = jnp.asarray(grid.shape, dtype=jnp.int32)
    else:
        size = dyn_size.astype(jnp.int32)

    out = 0.0
    for sel in itertools.product((0, 1), repeat=3):
        corner = base + jnp.asarray(sel, dtype=jnp.int32)
        inb = jnp.all((corner >= 0) & (corner < size), axis=-1)
        idx = _lookup(grid.index_vol, corner, grid.shape)
        idx = jnp.where(inb, idx, jnp.int32(-1))
        w = (
            (w1[:, 0] if sel[0] else w0[:, 0])
            * (w1[:, 1] if sel[1] else w0[:, 1])
            * (w1[:, 2] if sel[2] else w0[:, 2])
        )
        # zeros padding: out-of-bounds taps keep their weight but read 0
        out = out + _gather_rows(feats, idx) * w[:, None]
    return out


def scatter_channel_sum(feats, grid: SparseGrid):
    """Dense per-voxel channel-sum volume (demo occupancy ingredient,
    SparseConvNet.encode: msk = dense.sum(channel), SparseConvNet.py:131-137).
    Returns (D, H, W) float32."""
    vals = jnp.where(grid.valid, feats.sum(axis=-1), 0.0)
    safe = jnp.where(
        grid.valid[:, None], grid.coords, jnp.asarray(grid.shape, jnp.int32)
    )
    vol = jnp.zeros(grid.shape, dtype=feats.dtype)
    return vol.at[safe[:, 0], safe[:, 1], safe[:, 2]].set(vals, mode="drop")


def scatter_dense_rows(feats, grid: SparseGrid):
    """`scatter_dense` without the 4D reshape: returns the flat
    (D*H*W, C) row matrix. The row scatter's natural channel-major layout
    and the 4D table-build layout differ — materializing the volume 4D in
    f32 paid a 110 MB relayout copy per frame on the level-1 volume;
    callers that quantize should do so on these flat rows and reshape the
    (4x smaller) uint8 result instead."""
    C = feats.shape[-1]
    D, H, W = grid.shape
    flat_idx = (grid.coords[:, 0] * H + grid.coords[:, 1]) * W + grid.coords[
        :, 2
    ]
    safe = jnp.where(grid.valid, flat_idx, D * H * W)
    vals = jnp.where(
        grid.valid[:, None], feats, jnp.zeros((), dtype=feats.dtype)
    )
    return (
        jnp.zeros((D * H * W, C), dtype=feats.dtype)
        .at[safe]
        .set(vals, mode="drop")
    )


def scatter_dense(feats, grid: SparseGrid):
    """Materialize the dense feature volume (D, H, W, C) — only used by
    tests and the mesh path; the render hot path gathers sparsely."""
    C = feats.shape[-1]
    safe = jnp.where(
        grid.valid[:, None], grid.coords, jnp.asarray(grid.shape, jnp.int32)
    )
    vol = jnp.zeros(grid.shape + (C,), dtype=feats.dtype)
    vals = jnp.where(
        grid.valid[:, None], feats, jnp.zeros((), dtype=feats.dtype)
    )
    return vol.at[safe[:, 0], safe[:, 1], safe[:, 2]].set(vals, mode="drop")
