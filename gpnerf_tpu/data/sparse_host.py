"""Host-side sparse-pyramid construction (numpy).

The voxel active-set pyramid and the conv neighbor tables depend ONLY on the
frame's SMPL voxel coords — which the dataset computes on the host anyway
(ZjumocapDataset.prepare_input, /root/reference/libs/datasets/
ZjumocapDataset.py:207-256). Round 1 built them on-device with ~50 small
scatter/nonzero ops per frame; on a networked TPU runtime each small op
costs ~0.5 ms of dispatch, so pyramid construction alone was ~50 ms of the
frame budget (round-2 stage profile). Here the pyramid is built in numpy in
the DataLoader workers and shipped as padded batch arrays; the device side
reduces to pure gathers + MXU matmuls.

Semantics (must match ops/sparse_conv.py exactly; parity-tested):
  * level 0: input coords deduplicated, FIRST occurrence wins (device path:
    scatter-min row id). Rows are sorted by flat voxel index.
  * level i+1 active set: output site o is active iff its k=3 s=2 p=1
    receptive field [2o-1, 2o+1] contains an active input — per dim the
    candidates for input c are {c//2, (c+1)//2}. Rows sorted by flat index
    (device path: nonzero scan order).
  * subm neighbor table (cap, 27): row id of each 3^3 neighbor at the same
    level, -1 when absent/out of bounds. Tap k = ((kd*3)+kh)*3+kw with
    offset (kd-1, kh-1, kw-1).
  * strided table (cap_out, 27): row id into the INPUT level at
    2*o + offset(k).
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence

import numpy as np

_OFFSETS_3 = np.array(
    list(itertools.product((-1, 0, 1), repeat=3)), dtype=np.int64
)  # (27, 3), dhw order — tap order matches ops/sparse_conv._OFFSETS_3


def _flat(coords, shape):
    D, H, W = shape
    return (coords[:, 0].astype(np.int64) * H + coords[:, 1]) * W + coords[:, 2]


# persistent direct-index lookup buffers per level shape: a flat int32
# voxel -> row-id table with a +1 HALO on every face, kept at -1, filled
# with a level's rows, queried by plain fancy indexing, then reset by
# re-scattering -1 to only the touched entries. The halo absorbs every
# +-1-neighbor query (k=3 convs never reach further), so neighbor lookups
# need no bounds masks at all — this is the per-item hot path (~2M
# queries/frame) and bounds reductions dominated the numpy profile.
# THREAD-LOCAL: two thread-prefetch DataLoaders in one process (train loader
# still prefetching while the eval loader runs at valiter_interval) would
# otherwise fill/reset the same numpy buffer concurrently (numpy releases
# the GIL) and silently corrupt neighbor/down tables.
import threading as _threading

_IDX_CACHE = _threading.local()


def _halo_buffer(shape):
    cache = getattr(_IDX_CACHE, "bufs", None)
    if cache is None:
        cache = _IDX_CACHE.bufs = {}
    key = tuple(int(v) + 2 for v in shape)
    n = key[0] * key[1] * key[2]
    buf = cache.get(key)
    if buf is None or buf.size != n:
        buf = np.full(n, -1, np.int32)
        cache[key] = buf
    return buf


def _halo_flat(coords, shape):
    """Flat index into the halo buffer for REAL coords (0-based)."""
    Hh = shape[1] + 2
    Wh = shape[2] + 2
    c = coords.astype(np.int32)
    return ((c[:, 0] + 1) * Hh + (c[:, 1] + 1)) * Wh + (c[:, 2] + 1)


def _halo_offsets(shape):
    Hh = shape[1] + 2
    Wh = shape[2] + 2
    o = _OFFSETS_3.astype(np.int32)
    return (o[:, 0] * Hh + o[:, 1]) * Wh + o[:, 2]


def _pad_rows(arr, cap, fill):
    out = np.full((cap,) + arr.shape[1:], fill, arr.dtype)
    n = min(len(arr), cap)
    out[:n] = arr[:n]
    return out, max(len(arr) - cap, 0)


def build_host_pyramid(
    coord: np.ndarray,
    shape: Sequence[int],
    site_cap: int,
    level_caps: Sequence[int],
    n_levels: int = 4,
) -> Dict[str, np.ndarray]:
    """Build the 5-level active-set pyramid + neighbor tables.

    Args:
      coord: (S, 3) int dhw voxel coords (may contain duplicates).
      shape: static (D, H, W) of level 0 (cfg.tpu.max_out_sh).
      site_cap: row capacity of level 0.
      level_caps: capacities of levels 1..n_levels.

    Returns dict of padded arrays:
      lvl{i}_coords (cap_i, 3) int32 — padding rows hold the level shape
        (out of bounds, scatters drop them);
      lvl{i}_valid (cap_i,) bool;
      lvl{i}_nbr (cap_i, 27) int32 subm neighbor table (-1 absent);
      lvl{i}_down (cap_i, 27) int32 for i >= 1 — strided conv table into
        level i-1 rows;
      vertex_rows (site_cap,) int32 — winning input row (vertex id) per
        level-0 site, -1 for padding;
      pyramid_overflows (n_levels + 1,) int32.
    """
    caps = [int(site_cap)] + [int(c) for c in level_caps]
    while len(caps) < n_levels + 1:
        caps.append(caps[-1])
    # ship tables as int16 when row ids fit: the pyramid is ~6 MB/item in
    # int32 and host->device transfer is the train bottleneck; the device
    # casts back to int32 inside the jitted step (free). vertex_rows indexes
    # the INPUT vertex array, so len(coord) must fit too (SMPL is 6,890
    # verts; the guard keeps arbitrary vertex sets from silently wrapping).
    idt = (
        np.int16
        if (max(caps) < 32000 and max(shape) < 32000 and len(coord) < 32000)
        else np.int32
    )
    shapes = [tuple(int(v) >> i for v in shape) for i in range(n_levels + 1)]

    out: Dict[str, np.ndarray] = {}
    overflows = []

    # level 0: dedup, first occurrence wins (== device scatter-min row id)
    coord = np.asarray(coord, np.int64)
    flat0 = _flat(coord, shapes[0])
    uniq, first_idx = np.unique(flat0, return_index=True)
    order = np.argsort(uniq, kind="stable")  # already sorted; keep explicit
    uniq = uniq[order]
    vertex_rows = first_idx[order].astype(np.int32)

    level_flat: List[np.ndarray] = [uniq]
    level_coords: List[np.ndarray] = []
    D0, H0, W0 = shapes[0]
    c0 = np.stack(
        [uniq // (H0 * W0), (uniq // W0) % H0, uniq % W0], axis=-1
    ).astype(np.int32)
    level_coords.append(c0)

    for i in range(n_levels):
        oD, oH, oW = shapes[i + 1]
        cin = level_coords[i].astype(np.int32)
        lo = cin // 2
        hi = (cin + 1) // 2
        # per-dim upper-bound validity (lower bound is always >= 0); a hi
        # candidate can land exactly at the level size and must be dropped
        hv = [hi[:, d] < (oD, oH, oW)[d] for d in range(3)]
        flats = []
        for sel in itertools.product((0, 1), repeat=3):
            d0 = hi[:, 0] if sel[0] else lo[:, 0]
            d1 = hi[:, 1] if sel[1] else lo[:, 1]
            d2 = hi[:, 2] if sel[2] else lo[:, 2]
            f = (d0.astype(np.int64) * oH + d1) * oW + d2
            m = None
            for d in range(3):
                if sel[d]:
                    m = hv[d] if m is None else (m & hv[d])
            flats.append(f if m is None else f[m])
        uniq_o = np.unique(np.concatenate(flats))
        co = np.stack(
            [uniq_o // (oH * oW), (uniq_o // oW) % oH, uniq_o % oW], axis=-1
        ).astype(np.int32)
        level_flat.append(uniq_o)
        level_coords.append(co)

    for i in range(n_levels + 1):
        cap = caps[i]
        sh = shapes[i]
        coords_i = level_coords[i]
        n = len(coords_i)
        nv = min(n, cap)
        overflows.append(max(n - cap, 0))
        padded = np.full((cap, 3), sh, idt)
        padded[:nv] = coords_i[:cap]
        valid = np.zeros((cap,), bool)
        valid[:nv] = True
        out[f"lvl{i}_coords"] = padded
        out[f"lvl{i}_valid"] = valid

        # fill this level's halo index table (reset after use below)
        buf = _halo_buffer(sh)
        base = _halo_flat(coords_i[:nv], sh)
        buf[base] = np.arange(nv, dtype=np.int32)
        offs = _halo_offsets(sh)

        # subm neighbor table at this level (valid rows only; padding -1)
        nbr = np.full((cap, 27), -1, idt)
        nbr[:nv] = buf[base[:, None] + offs[None]]
        out[f"lvl{i}_nbr"] = nbr

        if i + 1 <= n_levels:
            # the NEXT level's strided table queries THIS level's rows at
            # 2*o + offset — compute it while the buffer is filled.
            # Centers 2*o lie in [0, dim-2], so +-1 offsets stay inside the
            # halo coverage.
            cap_o = caps[i + 1]
            co = level_coords[i + 1]
            no = min(len(co), cap_o)
            down = np.full((cap_o, 27), -1, idt)
            base_o = _halo_flat(co[:no] * 2, sh)
            down[:no] = buf[base_o[:, None] + offs[None]]
            out[f"lvl{i + 1}_down"] = down

        buf[base] = -1  # reset touched entries only

    vr = np.full((caps[0],), -1, idt)
    vr[: min(len(vertex_rows), caps[0])] = vertex_rows[: caps[0]]
    out["vertex_rows"] = vr
    out["pyramid_overflows"] = np.asarray(overflows, np.int32)
    return out
