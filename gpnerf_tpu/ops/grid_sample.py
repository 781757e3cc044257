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
