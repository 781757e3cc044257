"""Bilinear / trilinear grid sampling (torch `F.grid_sample` semantics).

The reference leans on ATen's CUDA `grid_sample` kernel in five places
(2D: /root/reference/libs/renders/BaseRender.py:346,352,356 and
demo_render.py:586,594,625; 3D: libs/nerfheads/networks/SparseConvNet.py:
113-116, demo_render.py:274-279), always with ``align_corners=True`` and
``padding_mode='zeros'``. This module reimplements exactly those semantics as
XLA gathers + lerps. Bit-parity matters: an off-by-half-voxel here breaks
PSNR parity (SURVEY.md §7 "hard parts").

Layouts are channel-last internally (TPU-friendly: the channel axis maps to
lanes and the gather moves whole (C,) rows); channel-first wrappers match the
torch call signatures for tests and drop-in use.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


def _unnormalize(coord, size):
    """align_corners=True: [-1, 1] -> [0, size-1]."""
    return (coord + 1.0) * 0.5 * (size - 1)


def grid_sample_2d_nhwc(img, grid):
    """Sample `img` at normalized `grid` locations.

    Args:
      img: (N, H, W, C) array.
      grid: (N, ..., 2) array of (x, y) in [-1, 1]; x indexes W, y indexes H.

    Returns:
      (N, ..., C) sampled values; out-of-bounds taps contribute zero
      (padding_mode='zeros', align_corners=True).
    """
    N, H, W, C = img.shape
    out_shape = grid.shape[:-1] + (C,)
    grid = grid.reshape(N, -1, 2)

    x = _unnormalize(grid[..., 0], W)  # (N, P)
    y = _unnormalize(grid[..., 1], H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    img_flat = img.reshape(N, H * W, C)

    def tap(xi, yi, wxi, wyi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        idx = yc * W + xc  # (N, P)
        vals = jnp.take_along_axis(img_flat, idx[..., None], axis=1)  # (N,P,C)
        w = (wxi * wyi) * inb.astype(img.dtype)
        return vals * w[..., None]

    out = (
        tap(x0, y0, wx0, wy0)
        + tap(x1, y0, wx1, wy0)
        + tap(x0, y1, wx0, wy1)
        + tap(x1, y1, wx1, wy1)
    )
    return out.reshape(out_shape)


def grid_sample_2d(img_nchw, grid):
    """torch-signature wrapper: img (N,C,H,W), grid (N,Hg,Wg,2) -> (N,C,Hg,Wg)."""
    img = jnp.moveaxis(img_nchw, 1, -1)
    out = grid_sample_2d_nhwc(img, grid)  # (N, Hg, Wg, C)
    return jnp.moveaxis(out, -1, 1)


def grid_sample_3d_ndhwc(vol, grid):
    """Trilinear sample of `vol` at normalized `grid` locations.

    Args:
      vol: (N, D, H, W, C) array.
      grid: (N, ..., 3) of (x, y, z) in [-1, 1]; x indexes W, y indexes H,
        z indexes D (torch grid_sample convention).

    Returns:
      (N, ..., C); zeros padding, align_corners=True.
    """
    N, D, H, W, C = vol.shape
    out_shape = grid.shape[:-1] + (C,)
    grid = grid.reshape(N, -1, 3)

    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx1, wy1, wz1 = x - x0, y - y0, z - z0
    wx0, wy0, wz0 = 1.0 - wx1, 1.0 - wy1, 1.0 - wz1

    vol_flat = vol.reshape(N, D * H * W, C)

    def tap(xi, yi, zi, w):
        inb = (
            (xi >= 0)
            & (xi <= W - 1)
            & (yi >= 0)
            & (yi <= H - 1)
            & (zi >= 0)
            & (zi <= D - 1)
        )
        xc = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yc = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        zc = jnp.clip(zi, 0, D - 1).astype(jnp.int32)
        idx = (zc * H + yc) * W + xc
        vals = jnp.take_along_axis(vol_flat, idx[..., None], axis=1)
        return vals * (w * inb.astype(vol.dtype))[..., None]

    out = (
        tap(x0, y0, z0, wx0 * wy0 * wz0)
        + tap(x0 + 1, y0, z0, wx1 * wy0 * wz0)
        + tap(x0, y0 + 1, z0, wx0 * wy1 * wz0)
        + tap(x0 + 1, y0 + 1, z0, wx1 * wy1 * wz0)
        + tap(x0, y0, z0 + 1, wx0 * wy0 * wz1)
        + tap(x0 + 1, y0, z0 + 1, wx1 * wy0 * wz1)
        + tap(x0, y0 + 1, z0 + 1, wx0 * wy1 * wz1)
        + tap(x0 + 1, y0 + 1, z0 + 1, wx1 * wy1 * wz1)
    )
    return out.reshape(out_shape)


def grid_sample_3d(vol_ncdhw, grid):
    """torch-signature wrapper: vol (N,C,D,H,W), grid (N,Dg,Hg,Wg,3) ->
    (N,C,Dg,Hg,Wg)."""
    vol = jnp.moveaxis(vol_ncdhw, 1, -1)
    out = grid_sample_3d_ndhwc(vol, grid)
    return jnp.moveaxis(out, -1, 1)


def build_quad_table_2d(img):
    """Pack each bilinear footprint into one row: table[y+1, x+1] =
    [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]] for base coords
    y, x in [-1, size-1] (zeros outside). One row-gather then fetches all 4
    taps of a bilinear sample — on a TPU the random-gather cost is per-ROW,
    so this quarters the gather count of `grid_sample_2d_nhwc` at the price
    of a 4x-sized table built once per frame.

    img: (..., H, W, C) -> (..., H+1, W+1, 4C)."""
    pad = [(0, 0)] * (img.ndim - 3) + [(1, 1), (1, 1), (0, 0)]
    p = jnp.pad(img, pad)
    return jnp.concatenate(
        [
            p[..., :-1, :-1, :],
            p[..., :-1, 1:, :],
            p[..., 1:, :-1, :],
            p[..., 1:, 1:, :],
        ],
        axis=-1,
    )


def bilinear_quad_nhwc(table, grid, h, w, scale=None, out_dtype=None):
    """`grid_sample_2d_nhwc` semantics through a quad table.

    table: (N, H+1, W+1, 4C) from build_quad_table_2d.
    grid: (N, P, 2) normalized (x, y) in [-1, 1] (align_corners=True).
    `scale`/`out_dtype`: as in bilinear_quad_nhwc_pv (int8 dequant factors
    applied after the weighted sum).
    Returns (N, P, C)."""
    N = table.shape[0]
    C4 = table.shape[-1]
    C = C4 // 4
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0)
    wy1 = (y - y0)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    # clip base into the table's [-1, size-1] coverage; fully-outside
    # samples get zero weight on every tap below
    xc = jnp.clip(xi, -1, w - 1) + 1
    yc = jnp.clip(yi, -1, h - 1) + 1
    flat = table.reshape(N, (h + 1) * (w + 1), C4)
    rows = jnp.take_along_axis(
        flat, (yc * (w + 1) + xc)[..., None], axis=1
    )  # (N, P, 4C)
    quantized = table.dtype in (jnp.int8, jnp.uint8)
    dt = out_dtype if out_dtype is not None else (
        jnp.float32 if quantized else table.dtype
    )
    wx1 = wx1.astype(dt)
    wy1 = wy1.astype(dt)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def tapw(xi_, yi_, wgt):
        inb = (xi_ >= 0) & (xi_ <= w - 1) & (yi_ >= 0) & (yi_ <= h - 1)
        return (wgt * inb.astype(dt))[..., None]

    out = (
        rows[..., 0 * C : 1 * C].astype(dt) * tapw(xi, yi, wx0 * wy0)
        + rows[..., 1 * C : 2 * C].astype(dt) * tapw(xi + 1, yi, wx1 * wy0)
        + rows[..., 2 * C : 3 * C].astype(dt) * tapw(xi, yi + 1, wx0 * wy1)
        + rows[..., 3 * C : 4 * C].astype(dt) * tapw(xi + 1, yi + 1, wx1 * wy1)
    )
    if scale is not None:
        out = out * scale.astype(dt)[None, None, :]
    # base clipped => row mismatch only when the sample is >=1 cell outside,
    # where all tap weights are zero already
    return out


def bilinear_quad_nhwc_pv(table, grid, h, w, scale=None, out_dtype=None):
    """`bilinear_quad_nhwc` with the gather emitted in (P, V) row order
    from the view-concatenated flat table: ONE gather op whose output is
    already (P, V, C) — no (V, P, C) -> (P, V, C) transpose copy (measured
    1.2 ms on the 344k-point demo frame).

    table: (V, H+1, W+1, 4C); grid: (V, P, 2) normalized (align_corners).
    `scale`: per-channel (C,) dequantization factors when the table is
    int8-quantized (quantize_image_i8) — applied AFTER the bilinear
    weighted sum (interpolation is linear, so the per-channel factor
    commutes out). Returns (P, V, C)."""
    V = table.shape[0]
    C4 = table.shape[-1]
    C = C4 // 4
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0)
    wy1 = (y - y0)
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    xc = jnp.clip(xi, -1, w - 1) + 1
    yc = jnp.clip(yi, -1, h - 1) + 1
    stride = (h + 1) * (w + 1)
    voff = jnp.arange(V, dtype=jnp.int32)[:, None] * stride  # (V, 1)
    idx_pv = (yc * (w + 1) + xc + voff).T  # (P, V)
    flat = table.reshape(V * stride, C4)
    rows = flat[idx_pv]  # (P, V, 4C) — gather directly in (P, V) order
    # (a flat (P*V, 4C) gather + flat weighted sum measured 7 ms/frame
    # SLOWER: the relayout the 3D form pays up front reappears bigger
    # downstream of the flat result)
    quantized = table.dtype in (jnp.int8, jnp.uint8)
    dt = out_dtype if out_dtype is not None else (
        jnp.float32 if quantized else table.dtype
    )
    wx1 = wx1.T.astype(dt)
    wy1 = wy1.T.astype(dt)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    xiT = xi.T
    yiT = yi.T

    def tapw(xi_, yi_, wgt):
        inb = (xi_ >= 0) & (xi_ <= w - 1) & (yi_ >= 0) & (yi_ <= h - 1)
        return (wgt * inb.astype(dt))[..., None]

    out = (
        rows[..., 0 * C : 1 * C].astype(dt) * tapw(xiT, yiT, wx0 * wy0)
        + rows[..., 1 * C : 2 * C].astype(dt) * tapw(xiT + 1, yiT, wx1 * wy0)
        + rows[..., 2 * C : 3 * C].astype(dt) * tapw(xiT, yiT + 1, wx0 * wy1)
        + rows[..., 3 * C : 4 * C].astype(dt) * tapw(xiT + 1, yiT + 1, wx1 * wy1)
    )
    if scale is not None:
        out = out * scale.astype(dt)[None, None, :]
    return out


def bilinear_quad_nhwc_pv_pallas(table, grid, h, w, scale=None,
                                 out_dtype=None, interpret=False):
    """`bilinear_quad_nhwc_pv` with the post-gather weighted sum + dequant
    fused in a Pallas kernel that writes the result CHANNEL-MAJOR
    (ops.pallas_lerp): the gather rows are consumed in their native
    row-major layout, so XLA's 2.4 ms/frame double re-tile of the int8
    gather output disappears. Returns (P, V, C) as a lazy transpose of the
    (C, P, V) kernel output — layout assignment folds it into the
    point-on-lanes consumers."""
    from gpnerf_tpu.ops.pallas_lerp import quad_lerp_rows_vcp

    V = table.shape[0]
    C4 = table.shape[-1]
    C = C4 // 4
    x = _unnormalize(grid[..., 0], w)
    y = _unnormalize(grid[..., 1], h)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0).astype(jnp.float32)
    wy1 = (y - y0).astype(jnp.float32)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    xc = jnp.clip(xi, -1, w - 1) + 1
    yc = jnp.clip(yi, -1, h - 1) + 1
    stride = (h + 1) * (w + 1)
    voff = jnp.arange(V, dtype=jnp.int32)[:, None] * stride  # (V, 1)
    idx_vp = yc * (w + 1) + xc + voff  # (V, P), natural view-major order
    P = idx_vp.shape[1]
    flat = table.reshape(V * stride, C4)
    rows = flat[idx_vp.reshape(-1)]  # (V*P, 4C), native row-major

    def tapw(xi_, yi_, wgt):
        inb = (xi_ >= 0) & (xi_ <= w - 1) & (yi_ >= 0) & (yi_ <= h - 1)
        return wgt * inb.astype(jnp.float32)  # (V, P)

    w4 = jnp.stack(
        [
            tapw(xi, yi, wx0 * wy0),
            tapw(xi + 1, yi, wx1 * wy0),
            tapw(xi, yi + 1, wx0 * wy1),
            tapw(xi + 1, yi + 1, wx1 * wy1),
        ],
        axis=1,
    )  # (V, 4, P) — same tap order as the quad table packing
    quantized = table.dtype == jnp.int8
    dt = out_dtype if out_dtype is not None else (
        jnp.float32 if quantized else table.dtype
    )
    sc = (
        scale.astype(jnp.float32)
        if scale is not None
        else jnp.ones((C,), jnp.float32)
    )
    out_vcp = quad_lerp_rows_vcp(
        rows, w4, sc, out_dtype=dt, interpret=interpret
    )  # (V, C, P) — physically the point stages' rgb_feat layout
    return out_vcp.transpose(2, 0, 1)  # lazy (P, V, C)


def build_octet_table_3d(vol):
    """Trilinear analog of build_quad_table_2d: table[z+1, y+1, x+1] packs
    the 8 corners of the cell at base (z, y, x) for bases in [-1, size-1].
    vol: (D, H, W, C) -> (D+1, H+1, W+1, 8C). 8x memory, 1 row-gather per
    trilinear sample instead of 8. (Building in flat (rows, C) form with
    per-corner slice reshapes measured 5 ms/frame SLOWER — each strided
    slice materializes separately there, while the 4D concat fuses them.)"""
    p = jnp.pad(vol, ((1, 1), (1, 1), (1, 1), (0, 0)))
    parts = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                parts.append(
                    p[
                        dz : p.shape[0] - 1 + dz,
                        dy : p.shape[1] - 1 + dy,
                        dx : p.shape[2] - 1 + dx,
                    ]
                )
    return jnp.concatenate(parts, axis=-1)


class FlatOctetTable(NamedTuple):
    """Octet table stored FLAT: rows (Dp*Hp*Wp + 1, 8C) with a trailing
    dump row (never gathered), plus the static 3D row-stride shape.

    Built by `build_octet_table_scatter` — byte-identical content to
    `build_octet_table_3d(dense).reshape(-1, 8C)` but born in the gather's
    row-major layout, so no 4D concat / reshape re-tiles ever run."""

    rows: jnp.ndarray
    shape: Tuple[int, int, int]


def build_octet_table_scatter(feats, coords, valid, shape, pack_words=False):
    """Corner-scatter octet build for a SPARSE level.

    The level-1 feature volume has only CAP (~16.9k) active sites; the
    slice-concat build (`build_octet_table_3d`) streams the full 228 MB
    table through pad/concat/reshape re-tiles regardless. Here each active
    row lands in its 8 covering table rows by ONE scatter-add of
    (8*CAP, 8C) pre-placed rows into a zeroed flat table (~35 MB of
    traffic): corner k = (dz, dy, dx) of table row (z, y, x) reads volume
    site (z-1+dz, y-1+dy, x-1+dx), so site (a, b, c) appears at row
    (a+1-dz, b+1-dy, c+1-dx) in lane block k. Each (row, lane-block) pair
    is written by at most one site (the site index is a bijection of the
    row index per corner), so scatter-add over disjoint lanes is exact.

    feats: (CAP, C) active-site rows, already zeroed at invalid rows (any
      dtype; uint8 for the quantized demo path).
    coords/valid: the level's (CAP, 3) int32 dhw coords + mask (coords must
      be deduplicated — SparseGrid/SparseLevel guarantee this).
    shape: static (D, H, W) of the level grid.
    Returns FlatOctetTable with rows (Dp*Hp*Wp + 1, 8C)."""
    import itertools as _it

    import jax

    CAP, C = feats.shape
    D, H, W = shape
    Dp, Hp, Wp = D + 1, H + 1, W + 1
    R = Dp * Hp * Wp
    # pack_words: scatter u8 rows as u32 WORDS (the add never carries across
    # bytes — each (row, corner-block) is written by at most one site). This
    # quarters the scattered element count and won under the round-3 XLA
    # (3.3 -> 1.5 ms) where the u32->u8 view back was a free bitcast; the
    # CURRENT compiler materializes that bitcast as ~11 ms of broadcast +
    # layout copies over the 228 MB table, so the default is the direct u8
    # scatter-add (sub-word RMW, ~3 ms, no post-pass).
    packed = pack_words and feats.dtype == jnp.uint8 and C % 4 == 0
    if packed:
        Cw = C // 4
        rows_in = jax.lax.bitcast_convert_type(
            feats.reshape(CAP, Cw, 4), jnp.uint32
        )
    else:
        Cw = C
        rows_in = feats
    idxs, parts = [], []
    for k, (dz, dy, dx) in enumerate(_it.product((0, 1), repeat=3)):
        tgt = coords + (1 - jnp.asarray([dz, dy, dx], jnp.int32))
        fl = (tgt[:, 0] * Hp + tgt[:, 1]) * Wp + tgt[:, 2]
        idxs.append(jnp.where(valid, fl, R))
        parts.append(jnp.pad(rows_in, ((0, 0), (k * Cw, (7 - k) * Cw))))
    table = jnp.zeros((R + 1, 8 * Cw), rows_in.dtype)
    table = table.at[jnp.concatenate(idxs)].add(
        jnp.concatenate(parts), mode="drop", unique_indices=False
    )
    if packed:
        table = jax.lax.bitcast_convert_type(table, jnp.uint8).reshape(
            R + 1, 8 * C
        )
    return FlatOctetTable(table, (Dp, Hp, Wp))


def build_octet_table_3d_u32(q):
    """`build_octet_table_3d` on a uint8-quantized volume, built and stored
    as packed uint32 words (4 channels/word): XLA's minor-axis concatenate
    of 8 strided u8 slices runs at sub-word-access granularity; packing
    quarters the element count of the pad+concat while keeping the table
    bytes identical. `trilinear_octet_rows` unpacks gathered rows back to
    u8 (gather cost is unchanged — same row bytes).

    q: (D, H, W, C) uint8 with C % 4 == 0 -> (D+1, H+1, W+1, 2C) uint32."""
    import jax

    D, H, W, C = q.shape
    q32 = jax.lax.bitcast_convert_type(
        q.reshape(D, H, W, C // 4, 4), jnp.uint32
    )
    return build_octet_table_3d(q32)


def _axis_resample_matrix(n_out_max, n_in_max, n_out_dyn, n_in_dyn,
                          dtype=jnp.float32):
    """(n_out_max, n_in_max) interpolation matrix M with
    M[j] = linear-interp weights of position j*(n_in_dyn-1)/(n_out_dyn-1)
    (align_corners mapping between the two grids); rows j >= n_out_dyn and
    columns >= n_in_dyn are zero. Applying it along an axis reproduces a
    trilinear resample of a coarse align-corners field onto a finer grid as
    one MXU matmul instead of per-voxel gathers."""
    j = jnp.arange(n_out_max, dtype=dtype)
    ratio = (n_in_dyn - 1).astype(dtype) / jnp.maximum(
        (n_out_dyn - 1).astype(dtype), 1.0
    )
    pos = j * ratio
    lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n_in_max - 1)
    hi = jnp.minimum(lo + 1, n_in_dyn.astype(jnp.int32) - 1)
    w1 = pos - lo.astype(dtype)
    m = jnp.zeros((n_out_max, n_in_max), dtype)
    rows = jnp.arange(n_out_max)
    m = m.at[rows, lo].add(1.0 - w1)
    m = m.at[rows, jnp.clip(hi, 0, n_in_max - 1)].add(w1)
    valid = (j < n_out_dyn.astype(dtype))[:, None]
    return m * valid


def resample_volume_to(vol, out_shape_max, size_out_dyn, size_in_dyn,
                       dtype=None):
    """Trilinear-resample a (D, H, W, C) align-corners field onto a finer
    grid (out_shape_max static buffer, size_out_dyn valid extent) via three
    separable interpolation matmuls — dense MXU work, zero gathers.
    `dtype`: compute/output dtype (default f32; bf16 halves the HBM
    traffic of the intermediate volumes for large targets)."""
    Do, Ho, Wo = out_shape_max
    Dd, Hd, Wd = vol.shape[:3]
    dt = jnp.float32 if dtype is None else dtype
    md = _axis_resample_matrix(Do, Dd, size_out_dyn[0], size_in_dyn[0], dt)
    mh = _axis_resample_matrix(Ho, Hd, size_out_dyn[1], size_in_dyn[1], dt)
    mw = _axis_resample_matrix(Wo, Wd, size_out_dyn[2], size_in_dyn[2], dt)
    v = vol.astype(dt)
    v = jnp.einsum("od,dhwc->ohwc", md, v)
    v = jnp.einsum("ph,ohwc->opwc", mh, v)
    v = jnp.einsum("qw,opwc->opqc", mw, v)
    return v


def upsample_image_align_corners(img, Ho, Wo):
    """Bilinear align-corners resample of (V, Hi, Wi, C) images to
    (V, Ho, Wo, C) via two separable interpolation matmuls (MXU work, no
    gathers). Used to bring encoder feature maps to source-image resolution
    so the per-point projection gather fetches [rgb|features] as ONE row."""
    V, Hi, Wi, C = img.shape
    mh = _axis_resample_matrix(
        Ho, Hi, jnp.asarray(Ho, jnp.int32), jnp.asarray(Hi, jnp.int32)
    )
    mw = _axis_resample_matrix(
        Wo, Wi, jnp.asarray(Wo, jnp.int32), jnp.asarray(Wi, jnp.int32)
    )
    out = jnp.einsum("oh,vhwc->vowc", mh, img.astype(jnp.float32))
    return jnp.einsum("pw,vowc->vopc", mw, out)


def quantize_volume_u8(vol, eps=1e-8):
    """Per-channel symmetric uint8 quantization of a non-negative feature
    volume (the sparse conv levels are post-ReLU). Returns (q (..., C) uint8,
    scale (C,) float32)."""
    vmax = jnp.maximum(vol.reshape(-1, vol.shape[-1]).max(axis=0), eps)
    scale = (vmax / 255.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(vol / scale), 0, 255).astype(jnp.uint8)
    return q, scale


class Int4Table(NamedTuple):
    """Octet table with int4-PACKED channels: uint8 bytes whose LOW nibble
    is channel c and HIGH nibble channel c + C//2 (split-pack — unpacking
    is one minor-axis concat of the two nibble planes, no interleave).
    Built as build_octet_table_3d(quantize_volume_i4(vol)) and consumed by
    trilinear_octet_rows, which sign-extends after the gather. Halves the
    gather row bytes of the (already folded) coarse table."""

    table: jnp.ndarray  # (D+1, H+1, W+1, 8 * C//2) uint8


class NearestTable(NamedTuple):
    """Flat per-voxel rows sampled NEAREST-neighbor (round(pos)): one
    C-channel row-gather per point instead of an 8C octet row — an option
    for smooth fields (the folded coarse level), 8x fewer gather bytes at
    the cost of piecewise-constant interpolation. `div` is the grid's
    divisor relative to the level-0 voxel extent (4 = the native level-2
    coarse grid; 2 = the field pre-upsampled onto the level-1 grid, which
    halves the piecewise-constant step at the same per-point gather
    bytes). `interleave` = 2 marks a table whose grid was midpoint-doubled
    along each axis (interleave_midpoints_3d): a valid extent of s at
    divisor `div` becomes 2s-1 table points, i.e. half-step rounding on
    the original grid."""

    rows: jnp.ndarray  # (D*H*W, C)
    shape: Tuple[int, int, int]
    div: int = 4
    interleave: int = 1
    # d/h/w bitmask (bit 0 = d) of axes sampled LINEARLY instead of
    # rounded: each set bit doubles the row gathers (2^popcount corners
    # of C bytes each) but restores exact interpolation along that axis
    # — the middle rungs between pure nearest (1 gather) and full
    # trilinear (8)
    lerp_axes: int = 0


def interleave_midpoints_3d(vol):
    """Midpoint-double a (D, H, W, C) uint8 field along each spatial axis:
    (2D-1, 2H-1, 2W-1, C), even indices = original points, odd = exact
    rounded averages of their neighbors (int16 math, no f32 volumes).
    This IS align-corners trilinear 2x upsampling restricted to the
    half-grid, so nearest sampling of the result rounds positions to half
    a source voxel. Built from stack+reshape (layout-friendly copies, no
    matmuls) — measured orders cheaper than a dense resample_volume_to on
    level-1-sized volumes."""

    def double(v, axis):
        n = v.shape[axis]
        sl = [slice(None)] * v.ndim
        sl_a = list(sl); sl_a[axis] = slice(0, n - 1)
        sl_b = list(sl); sl_b[axis] = slice(1, n)
        a = v[tuple(sl_a)]
        b = v[tuple(sl_b)]
        mid = (
            (a.astype(jnp.int16) + b.astype(jnp.int16) + 1) >> 1
        ).astype(jnp.uint8)
        pairs = jnp.stack([a, mid], axis=axis + 1)
        new_shape = list(v.shape)
        new_shape[axis] = 2 * (n - 1)
        pairs = pairs.reshape(new_shape)
        sl_last = list(sl); sl_last[axis] = slice(n - 1, n)
        return jnp.concatenate([pairs, v[tuple(sl_last)]], axis=axis)

    for ax in range(3):
        vol = double(vol, ax)
    return vol


def nearest_rows(table, pos, size, scale=None, out_dtype=None):
    """Nearest-neighbor sample of a NearestTable at voxel positions `pos`
    with dynamic valid extent `size` (zeros outside). Axes flagged in
    table.lerp_axes are sampled LINEARLY (floor/ceil corner pair) with
    per-corner zeros-outside masking, matching trilinear_dense_rows'
    zero-padding semantics on those axes. Returns (P, C)."""
    D, H, W = table.shape
    wdt = out_dtype if out_dtype is not None else jnp.float32
    axes = [a for a in range(3) if (table.lerp_axes >> a) & 1]
    if not axes:
        c = jnp.round(pos).astype(jnp.int32)
        inb = jnp.all((c >= 0) & (c < size), axis=-1)
        cc = jnp.clip(c, 0, jnp.asarray([D - 1, H - 1, W - 1]))
        idx = (cc[:, 0] * H + cc[:, 1]) * W + cc[:, 2]
        out = table.rows[idx].astype(wdt) * inb.astype(wdt)[:, None]
        if scale is not None:
            out = out * scale.astype(wdt)[None, :]
        return out

    import itertools as _it

    base = jnp.round(pos).astype(jnp.int32)
    fl = jnp.floor(pos)
    frac = (pos - fl).astype(wdt)
    base = base.at[:, jnp.asarray(axes)].set(
        fl.astype(jnp.int32)[:, jnp.asarray(axes)]
    )
    lim = jnp.asarray([D - 1, H - 1, W - 1])
    out = jnp.zeros((pos.shape[0], table.rows.shape[-1]), wdt)
    for combo in _it.product((0, 1), repeat=len(axes)):
        c = base
        w = jnp.ones((pos.shape[0],), wdt)
        for a, hi in zip(axes, combo):
            c = c.at[:, a].add(hi)
            w = w * (frac[:, a] if hi else 1.0 - frac[:, a])
        inb = jnp.all((c >= 0) & (c < size), axis=-1)
        cc = jnp.clip(c, 0, lim)
        idx = (cc[:, 0] * H + cc[:, 1]) * W + cc[:, 2]
        out = out + table.rows[idx].astype(wdt) * (
            w * inb.astype(wdt)
        )[:, None]
    if scale is not None:
        out = out * scale.astype(wdt)[None, :]
    return out


def quantize_volume_i4(vol, eps=1e-8):
    """Per-channel symmetric int4 quantization of a signed field, two
    channels packed per byte (split-pack: low nibbles = channels
    [0, C//2), high nibbles = channels [C//2, C)). Returns
    (packed (..., C//2) uint8, scale (C,) float32)."""
    C = vol.shape[-1]
    amax = jnp.maximum(jnp.abs(vol.reshape(-1, C)).max(axis=0), eps)
    scale = (amax / 7.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(vol / scale), -7, 7).astype(jnp.int32) & 0xF
    packed = (q[..., : C // 2] | (q[..., C // 2 :] << 4)).astype(jnp.uint8)
    return packed, scale


def quantize_image_i4(img, eps=1e-8):
    """Per-channel symmetric int4 split-pack of a feature image: channel c
    quantizes to [-7, 7] and packs with channel c + C/2 into one byte
    (low/high nibble, two's-complement). Halves the quad-table row bytes
    — the per-point VMEM gather cost scales with row bytes (~0.05 ns/B,
    trace_demo r5) — at ~15-level precision; the full-set PSNR gate
    judges the shipped default. C must be even.

    Returns (packed (..., C/2) uint8, scale (C,) float32); unpack =
    sign-extended nibble * scale[c] (ops/pallas_point.py `_unpack_i4`)."""
    C = img.shape[-1]
    assert C % 2 == 0, C
    amax = jnp.maximum(
        jnp.abs(img.reshape(-1, C)).max(axis=0), eps
    )
    scale = (amax / 7.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(img / scale), -7, 7).astype(jnp.int32)
    h = C // 2
    lo = q[..., :h] & 0xF
    hi = q[..., h:] & 0xF
    return (lo | (hi << 4)).astype(jnp.uint8), scale


def quantize_image_i8(img, eps=1e-8):
    """Per-channel symmetric int8 quantization of a (possibly signed) image
    or feature stack (the encoder's out_conv output is unbounded). Returns
    (q (..., C) int8, scale (C,) float32)."""
    amax = jnp.maximum(
        jnp.abs(img.reshape(-1, img.shape[-1])).max(axis=0), eps
    )
    scale = (amax / 127.0).astype(jnp.float32)
    q = jnp.clip(jnp.round(img / scale), -127, 127).astype(jnp.int8)
    return q, scale


def trilinear_octet_rows(table, pos, size, scale=None, out_dtype=None):
    """`trilinear_dense_rows` semantics through an octet table.

    table: (D+1, H+1, W+1, 8C); pos: (P, 3) dhw voxel units; size: (3,)
    dynamic valid extent (zeros padding outside). `scale`: per-channel (C,)
    dequantization factors when the table is uint8-quantized (halves the
    random-gather bytes of the dominant level-1 table); a uint32 table is
    the packed-word form from build_octet_table_3d_u32 and is unpacked back
    to u8 bytes after the gather. Returns (P, C)."""
    import itertools as _it

    import jax

    int4 = isinstance(table, Int4Table)
    if int4:
        table = table.table
    if isinstance(table, FlatOctetTable):
        Dp, Hp, Wp = table.shape
        flat = table.rows
        Cw = flat.shape[-1]
    else:
        Dp, Hp, Wp, Cw = table.shape
        flat = table.reshape(-1, Cw)
    packed_u32 = flat.dtype == jnp.uint32
    C8 = Cw * 4 if packed_u32 else Cw
    C = C8 // 8  # packed BYTES per corner when int4 (channels = 2C then)
    wdt = out_dtype if out_dtype is not None else (
        jnp.float32 if (scale is not None or packed_u32) else flat.dtype
    )
    base = jnp.floor(pos).astype(jnp.int32)
    w1 = (pos - jnp.floor(pos)).astype(wdt)
    w0 = 1.0 - w1
    bc = jnp.clip(base, -1, jnp.asarray([Dp - 2, Hp - 2, Wp - 2])) + 1
    rows = flat[(bc[:, 0] * Hp + bc[:, 1]) * Wp + bc[:, 2]]  # (P, 8C)
    if packed_u32:
        rows = jax.lax.bitcast_convert_type(rows, jnp.uint8).reshape(-1, C8)
    out = 0.0
    for k, sel in enumerate(_it.product((0, 1), repeat=3)):
        corner = base + jnp.asarray(sel, jnp.int32)
        inb = jnp.all((corner >= 0) & (corner < size), axis=-1)
        w = (
            (w1[:, 0] if sel[0] else w0[:, 0])
            * (w1[:, 1] if sel[1] else w0[:, 1])
            * (w1[:, 2] if sel[2] else w0[:, 2])
        )
        # per-corner-slice convert: quantized (u8) tables are converted
        # inside the fused weighted sum instead of materializing a full
        # (P, 8C) float copy of the gather output first
        seg = rows[:, k * C : (k + 1) * C]
        if int4:
            # split-pack nibbles -> sign-extended channels (low nibbles =
            # channels [0, C), high = [C, 2C) of the packed byte count C)
            s32 = seg.astype(jnp.int32)
            lo = s32 & 0xF
            hi = (s32 >> 4) & 0xF
            seg = jnp.concatenate(
                [lo - ((lo & 0x8) << 1), hi - ((hi & 0x8) << 1)], axis=-1
            )
        out = out + seg.astype(wdt) * (w * inb.astype(wdt))[:, None]
    if scale is not None:
        out = out * scale.astype(wdt)[None, :]
    return out


def octet_rows_and_weights(table, pos, size):
    """Gather-only half of `trilinear_octet_rows` for the fused point-stage
    kernel (ops/pallas_point.py geom tabs): returns the RAW packed octet
    rows plus the 8 trilinear corner weights with the zeros-outside mask
    folded — the weighted sum / dequantization happen inside the kernel.
    Index math is identical to trilinear_octet_rows.

    Returns (rows (P, 8C) table dtype, w8 (P, 8) f32)."""
    import itertools as _it

    if isinstance(table, FlatOctetTable):
        Dp, Hp, Wp = table.shape
        flat = table.rows
    else:
        Dp, Hp, Wp = table.shape[:3]
        flat = table.reshape(-1, table.shape[-1])
    base = jnp.floor(pos).astype(jnp.int32)
    w1 = (pos - jnp.floor(pos)).astype(jnp.float32)
    w0 = 1.0 - w1
    bc = jnp.clip(base, -1, jnp.asarray([Dp - 2, Hp - 2, Wp - 2])) + 1
    rows = flat[(bc[:, 0] * Hp + bc[:, 1]) * Wp + bc[:, 2]]  # (P, 8C)
    ws = []
    for sel in _it.product((0, 1), repeat=3):
        corner = base + jnp.asarray(sel, jnp.int32)
        inb = jnp.all((corner >= 0) & (corner < size), axis=-1)
        w = (
            (w1[:, 0] if sel[0] else w0[:, 0])
            * (w1[:, 1] if sel[1] else w0[:, 1])
            * (w1[:, 2] if sel[2] else w0[:, 2])
        )
        ws.append(w * inb.astype(jnp.float32))
    return rows, jnp.stack(ws, axis=-1)


def nearest_row_and_weight(table, pos, size):
    """Gather-only half of `nearest_rows` (lerp_axes == 0 form) for the
    fused point-stage kernel: raw nearest rows + the zeros-outside weight.
    Returns (rows (P, C) table dtype, w (P, 1) f32)."""
    assert table.lerp_axes == 0
    D, H, W = table.shape
    c = jnp.round(pos).astype(jnp.int32)
    inb = jnp.all((c >= 0) & (c < size), axis=-1)
    cc = jnp.clip(c, 0, jnp.asarray([D - 1, H - 1, W - 1]))
    rows = table.rows[(cc[:, 0] * H + cc[:, 1]) * W + cc[:, 2]]
    return rows, inb.astype(jnp.float32)[:, None]


def trilinear_dense_rows(vol, pos, dyn_size=None):
    """Trilinear sample of a dense (D, H, W, C) volume at absolute voxel
    positions with an optional dynamic valid extent. The demo renderer's
    per-point multi-scale query runs through this after materializing the
    per-level feature volumes once per frame: direct row gathers, no
    index-volume indirection. Returns (P, C)."""
    import itertools as _it

    D, H, W, C = vol.shape
    if dyn_size is None:
        size = jnp.asarray([D, H, W], jnp.int32)
    else:
        size = dyn_size.astype(jnp.int32)
    base = jnp.floor(pos).astype(jnp.int32)
    w1 = (pos - jnp.floor(pos)).astype(vol.dtype)
    w0 = 1.0 - w1
    flat = vol.reshape(-1, C)
    out = 0.0
    for sel in _it.product((0, 1), repeat=3):
        corner = base + jnp.asarray(sel, jnp.int32)
        inb = jnp.all((corner >= 0) & (corner < size), axis=-1)
        c = jnp.clip(corner, 0, jnp.asarray([D - 1, H - 1, W - 1]))
        idx = (c[:, 0] * H + c[:, 1]) * W + c[:, 2]
        w = (
            (w1[:, 0] if sel[0] else w0[:, 0])
            * (w1[:, 1] if sel[1] else w0[:, 1])
            * (w1[:, 2] if sel[2] else w0[:, 2])
        )
        out = out + flat[idx] * (w * inb.astype(vol.dtype))[:, None]
    return out


def trilinear_dense_gather(vol, pos, dyn_size=None):
    """Trilinear sample of a dense scalar volume at absolute voxel
    positions, with an optional *dynamic* valid extent (the per-frame out_sh
    region inside a static buffer). Zeros padding outside the dynamic
    extent — the demo renderer's occupancy lookup
    (/root/reference/libs/renders/demo_render.py:274-279).

    vol: (D, H, W); pos: (P, 3) dhw voxel units; dyn_size: (3,) or None.
    Returns (P,)."""
    import itertools as _it

    D, H, W = vol.shape
    if dyn_size is None:
        size = jnp.asarray([D, H, W], jnp.int32)
    else:
        size = dyn_size.astype(jnp.int32)
    base = jnp.floor(pos).astype(jnp.int32)
    w1 = pos - jnp.floor(pos)
    w0 = 1.0 - w1
    flat = vol.reshape(-1)
    out = 0.0
    for sel in _it.product((0, 1), repeat=3):
        corner = base + jnp.asarray(sel, jnp.int32)
        inb = jnp.all((corner >= 0) & (corner < size), axis=-1) & jnp.all(
            corner < jnp.asarray([D, H, W]), axis=-1
        )
        c = jnp.clip(corner, 0, jnp.asarray([D - 1, H - 1, W - 1]))
        idx = (c[:, 0] * H + c[:, 1]) * W + c[:, 2]
        w = (
            (w1[:, 0] if sel[0] else w0[:, 0])
            * (w1[:, 1] if sel[1] else w0[:, 1])
            * (w1[:, 2] if sel[2] else w0[:, 2])
        )
        out = out + flat[idx] * w * inb.astype(vol.dtype)
    return out
