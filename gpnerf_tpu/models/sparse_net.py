"""The 4-level sparse 3D CNN over the SMPL voxel grid.

Twin of /root/reference/libs/nerfheads/networks/SparseConvNet.py:90-143,
re-designed for TPU: the spconv CUDA stack becomes the gather->MXU-matmul
convolutions of `gpnerf_tpu.ops.sparse_conv` over static-capacity active
sets, and the `.dense()` + grid_sample multi-scale query becomes a sparse
trilinear gather through per-level index volumes — dense feature volumes are
never materialized.

Layer stack (SparseConvNet.py:96-103): double_conv(in, in) at the input
level, then per level i: stride_conv(-> out_dim[i], s=2) + double_conv.
Each conv is SubM/SparseConv3d (k=3, bias-free) + BatchNorm1d(eps 1e-3,
momentum 0.01) + ReLU. Query features are collected at the 4 downsampled
levels (sizes out_sh/2 .. out_sh/16) AFTER each level's double_conv and
concatenated (4 x 32 = 128 channels).

The active-set pyramid (grids) is geometry-only (no parameters) and is
built once per frame by `build_grid_pyramid`; the demo renderer reuses it
and the cached per-level features across the whole image
(SparseConvNet.encode, SparseConvNet.py:126-143).
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from gpnerf_tpu.models.layers import MaskedBatchNorm
from gpnerf_tpu.ops.sparse_conv import (
    SparseGrid,
    SparseLevel,
    build_sparse_grid,
    scatter_channel_sum,
    stride_active_set,
    stride_conv_tbl,
    subm_conv_tbl,
)


def build_grid_pyramid(
    coords, valid, shape: Sequence[int], caps: Sequence[int]
) -> Tuple[List[SparseGrid], jnp.ndarray]:
    """Input grid + 4 strided grids. caps: capacities for levels 1..4
    (level 4 reuses caps[-1] if caps has length 4). Returns (grids,
    overflow counts (4,))."""
    grids = [build_sparse_grid(coords, valid, tuple(shape))]
    overflows = []
    level_caps = list(caps)
    while len(level_caps) < 4:
        level_caps.append(level_caps[-1])
    for i in range(4):
        g, ov = stride_active_set(grids[-1], level_caps[i])
        grids.append(g)
        overflows.append(ov)
    return grids, jnp.stack(overflows)


class _DoubleConv(nn.Module):
    """SubM k3 + BN + ReLU, twice (SparseConvNet.py:33-49). Runs through the
    level's precomputed neighbor table (one gather + one MXU matmul per
    conv)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, level: SparseLevel, *, train: bool):
        cin = x.shape[-1]
        for j, ci in enumerate((cin, self.features)):
            w = self.param(
                f"w{j}",
                nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
                (27, ci if j == 0 else self.features, self.features),
            )
            x = subm_conv_tbl(x, level, w, compute_dtype=self.dtype)
            x = MaskedBatchNorm(name=f"bn{j}")(
                x, level.valid, use_running_average=not train
            )
            x = nn.relu(x)
        return x


class _StrideConv(nn.Module):
    """SparseConv3d k3 s2 p1 + BN + ReLU (SparseConvNet.py:78-87)."""

    features: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, level: SparseLevel, *, train: bool):
        w = self.param(
            "w",
            nn.initializers.variance_scaling(1.0, "fan_in", "normal"),
            (27, x.shape[-1], self.features),
        )
        x = stride_conv_tbl(x, level, w, compute_dtype=self.dtype)
        x = MaskedBatchNorm(name="bn")(x, level.valid, use_running_average=not train)
        return nn.relu(x)


class SparseConvNet(nn.Module):
    """n_layers=4 levels; out_dim=[32, 32, 32, 32] (trainhead.py:37-38).
    compute_dtype: conv matmul/gather dtype (BN statistics stay float32)."""

    n_layers: int = 4
    out_dim: Sequence[int] = (32, 32, 32, 32)
    compute_dtype: object = None

    @nn.compact
    def features(self, code, levels: List[SparseLevel], *, train: bool):
        """Run the conv stack; return per-level feature matrices
        [(CAP_i, out_dim[i-1]) for levels 1..4]. `code`: (CAP0, in_dim)."""
        assert len(self.out_dim) == self.n_layers
        in_dim = code.shape[-1]
        dt = self.compute_dtype
        x = _DoubleConv(in_dim, dtype=dt, name="subm0")(code, levels[0], train=train)
        level_feats = []
        for i in range(self.n_layers):
            x = _StrideConv(self.out_dim[i], dtype=dt, name=f"down{i}")(
                x, levels[i + 1], train=train
            )
            x = _DoubleConv(self.out_dim[i], dtype=dt, name=f"subm{i + 1}")(
                x, levels[i + 1], train=train
            )
            level_feats.append(x)
        return level_feats

    def query_sparse(self, level_feats, index_vols, shapes, dhw_vox,
                     out_sh_dyn):
        """Multi-scale trilinear query through per-level index volumes
        (training path: keeps gradients on the ~20k-row sparse feature
        matrices instead of differentiating through dense volume
        materialization)."""
        from gpnerf_tpu.ops.sparse_conv import trilinear_sparse_rows

        outs = []
        frac = dhw_vox / out_sh_dyn.astype(dhw_vox.dtype)
        for i in range(self.n_layers):
            size = out_sh_dyn // (2 ** (i + 1))
            pos = frac * (size - 1).astype(dhw_vox.dtype)
            outs.append(
                trilinear_sparse_rows(
                    level_feats[i], index_vols[i], shapes[i], pos,
                    dyn_size=size,
                )
            )
        return jnp.concatenate(outs, axis=-1)

    def query_octet(self, octet_vols, dhw_vox, out_sh_dyn, scales=None):
        """Multi-scale trilinear query through packed octet tables
        (ops.grid_sample.build_octet_table_3d): one row-gather per (point,
        level) instead of eight. `scales`: optional per-level dequantization
        factors for uint8 tables."""
        from gpnerf_tpu.ops.grid_sample import trilinear_octet_rows

        outs = []
        frac = dhw_vox / out_sh_dyn.astype(dhw_vox.dtype)
        for i in range(self.n_layers):
            size = out_sh_dyn // (2 ** (i + 1))
            pos = frac * (size - 1).astype(dhw_vox.dtype)
            sc = None if scales is None else scales[i]
            outs.append(
                trilinear_octet_rows(
                    octet_vols[i], pos, size, scale=sc,
                    out_dtype=self.compute_dtype,
                )
            )
        return jnp.concatenate(outs, axis=-1)

    def query_octet2(self, octet_l1, octet_coarse, dhw_vox, out_sh_dyn,
                     scales=None):
        """TWO-gather multi-scale query: the level-1 octet plus a combined
        [l2|l3|l4] 96-channel octet at level-2 resolution (the coarse
        levels' align-corners fields resampled onto the level-2 grid by
        ops.grid_sample.resample_volume_to — dense MXU matmuls once per
        frame). Halves the per-point random-gather count of query_octet;
        the resample is a reinterpolation of the smooth coarse features
        (quality-validated by the full-set sweep)."""
        from gpnerf_tpu.ops.grid_sample import (
            NearestTable,
            nearest_rows,
            trilinear_octet_rows,
        )

        frac = dhw_vox / out_sh_dyn.astype(dhw_vox.dtype)
        outs = []
        for i, tab in enumerate((octet_l1, octet_coarse)):
            if isinstance(tab, NearestTable):
                size = out_sh_dyn // tab.div
                if tab.interleave > 1:
                    # midpoint-doubled grid: s valid points became 2s-1
                    size = tab.interleave * (size - 1) + 1
                fn = nearest_rows
            else:
                size = out_sh_dyn // (2 ** (i + 1))
                fn = trilinear_octet_rows
            pos = frac * (size - 1).astype(dhw_vox.dtype)
            sc = None if scales is None else scales[i]
            outs.append(
                fn(tab, pos, size, scale=sc, out_dtype=self.compute_dtype)
            )
        return jnp.concatenate(outs, axis=-1)

    def query_dense(self, dense_vols, dhw_vox, out_sh_dyn):
        """Multi-scale trilinear query against materialized dense per-level
        volumes (the demo path scatters them once per frame; direct row
        gathers beat the index-volume indirection for large query counts)."""
        from gpnerf_tpu.ops.grid_sample import trilinear_dense_rows

        outs = []
        frac = dhw_vox / out_sh_dyn.astype(dhw_vox.dtype)
        for i in range(self.n_layers):
            size = out_sh_dyn // (2 ** (i + 1))
            pos = frac * (size - 1).astype(dhw_vox.dtype)
            outs.append(trilinear_dense_rows(dense_vols[i], pos, dyn_size=size))
        return jnp.concatenate(outs, axis=-1)




def _bn_affine(x, p, s, eps=1e-3):
    """Eval-mode BatchNorm1d: pure affine on running statistics
    (MaskedBatchNorm use_running_average branch)."""
    inv = 1.0 / jnp.sqrt(s["var"] + eps)
    return (
        (x.astype(jnp.float32) - s["mean"]) * inv * p["scale"] + p["bias"]
    ).astype(x.dtype)


def _conv3d(vol, w27, stride, compute_dtype=None):
    """Dense 3D conv with the sparse tap layout: w27 (27, Cin, Cout), tap
    k = ((kd*3)+kh)*3+kw at offset (kd-1, kh-1, kw-1) == correlation kernel
    (3,3,3,Cin,Cout) with SAME-style padding 1 (ops/sparse_conv.py:29-32)."""
    import jax

    k = w27.reshape(3, 3, 3, w27.shape[-2], w27.shape[-1])
    if compute_dtype is not None:
        vol = vol.astype(compute_dtype)
        k = k.astype(compute_dtype)
    # output stays float32 (preferred_element_type): the rows path rounds
    # only each conv's INPUT to the compute dtype (subm_conv_tbl) and keeps
    # activations/BN in f32 — chaining bf16 activations instead measured
    # -0.17 dB on the full set
    return jax.lax.conv_general_dilated(
        vol[None], k, window_strides=(stride,) * 3,
        padding=((1, 1),) * 3,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        preferred_element_type=jnp.float32,
    )[0]


def _dense_mask(grid):
    """(D, H, W, 1) float mask of a level's active sites."""
    safe = jnp.where(
        grid.valid[:, None], grid.coords, jnp.asarray(grid.shape, jnp.int32)
    )
    m = jnp.zeros(grid.shape, jnp.float32)
    m = m.at[safe[:, 0], safe[:, 1], safe[:, 2]].set(1.0, mode="drop")
    return m[..., None]


def sparse_net_dense_eval(params, stats, code, levels, *, n_layers=4,
                          compute_dtype=None):
    """EVAL-ONLY dense-convolution form of SparseConvNet.features.

    Identical math to the rows path (parity-tested): a submanifold conv is
    a dense conv over the zero-filled level volume with its output re-masked
    to the active set (inactive inputs contribute 0 either way,
    spconv.SubMConv3d semantics); the strided conv is a dense stride-2 conv
    masked to the strided active set; eval BatchNorm is the running-stats
    affine. On TPU this replaces ~2.4M random neighbor-row gathers per
    frame with a handful of MXU convolutions over the (small) level volumes
    — regular compute beats irregular gather. subm0 + the first strided
    conv stay in rows form (the level-0 dense volume would be ~0.5-1 GB;
    its table gathers are cheap).

    Args:
      params / stats: the `sigmahead/xyzc_net` param and batch_stats
        subtrees (torch-interop key layout preserved: subm{i}/w{j},
        subm{i}/bn{j}, down{i}/w, down{i}/bn).
      code: (CAP0, C) fused vertex codes scattered to level-0 rows.
      levels: SparseLevel pyramid (host tables).

    Returns [V1..V4] dense per-level volumes (D_i, H_i, W_i, 32), zero at
    inactive sites — the direct input for occupancy/octet table builds.
    """
    from gpnerf_tpu.ops.sparse_conv import (
        scatter_dense,
        stride_conv_tbl,
        subm_conv_tbl,
    )

    x = code
    for j in (0, 1):
        x = subm_conv_tbl(
            x, levels[0], params["subm0"][f"w{j}"], compute_dtype=compute_dtype
        )
        x = nn.relu(_bn_affine(x, params["subm0"][f"bn{j}"], stats["subm0"][f"bn{j}"]))
    x = stride_conv_tbl(
        x, levels[1], params["down0"]["w"], compute_dtype=compute_dtype
    )
    x = nn.relu(_bn_affine(x, params["down0"]["bn"], stats["down0"]["bn"]))

    V = scatter_dense(x, levels[1])
    vols = []
    for i in range(n_layers):
        lv = levels[i + 1]
        mask = _dense_mask(lv).astype(V.dtype)
        if i > 0:
            V = _conv3d(V, params[f"down{i}"]["w"], 2, compute_dtype)
            V = nn.relu(
                _bn_affine(V, params[f"down{i}"]["bn"], stats[f"down{i}"]["bn"])
            ) * mask
        for j in (0, 1):
            V = _conv3d(V, params[f"subm{i + 1}"][f"w{j}"], 1, compute_dtype)
            V = nn.relu(
                _bn_affine(
                    V, params[f"subm{i + 1}"][f"bn{j}"],
                    stats[f"subm{i + 1}"][f"bn{j}"],
                )
            ) * mask
        vols.append(V)
    return vols


def occupancy_volume_dense(vols, *, levels=None):
    """`occupancy_volume` from dense (masked) level volumes: per-level
    channel sums, nearest-upsampled to level-1 resolution and summed."""
    total = jnp.zeros(vols[0].shape[:3], jnp.float32)
    use = range(len(vols)) if levels is None else levels
    for i in use:
        v = vols[i].sum(axis=-1).astype(jnp.float32)
        for _ in range(i):
            v = v.repeat(2, axis=0).repeat(2, axis=1).repeat(2, axis=2)
        total = total + v
    return total


def occupancy_volume(level_feats, grids: List[SparseGrid], *, levels=None):
    """The demo renderer's `masks3d` (SparseConvNet.encode,
    SparseConvNet.py:126-143): per-level channel-sums, nearest-upsampled to
    the level-1 (first downsampled) resolution and summed.

    `levels` restricts which levels contribute (default: all, the reference
    semantics). The coarse levels blanket 8^3/16^3 level-1 blocks, dilating
    the occupied field by ~8 cm — `levels=(0,)` (level-1 only) gives a tight
    body-surface field for the optional fast cull.

    Returns (D1, H1, W1) float volume at level-1 resolution; occupied voxel
    world recovery uses coord * 2.0 level-0 units (the reference's
    `mask_xyz = where(masks3d > th) * 2.0`).
    """
    D1, H1, W1 = grids[1].shape
    total = jnp.zeros((D1, H1, W1), dtype=level_feats[0].dtype)
    use = range(len(level_feats)) if levels is None else levels
    for i in use:
        vol = scatter_channel_sum(level_feats[i], grids[i + 1])
        for _ in range(i):  # nearest-upsample by 2 per extra level
            vol = (
                vol.repeat(2, axis=0).repeat(2, axis=1).repeat(2, axis=2)
            )
        total = total + vol
    return total
