"""GP-NeRF heads: geometry-guided sigma head + IBRNet-style RGB head.

Twin of /root/reference/libs/nerfheads/trainhead.py:

  * `NeRFSigmaHead` (trainhead.py:27-76, paper Fig. 2a): learned per-SMPL-
    vertex latent codes (`nn.Embedding(6890, code_dim)`), fused with each
    vertex's 3 projected image features by cross-attention, scattered into
    the sparse voxel grid and processed by the 4-level SparseConvNet; query
    points gather the 4-scale concat (128ch) -> Linear(128, 64) + ELU =
    sigma_feat.
  * `NeRFRGBHead` (trainhead.py:79-145, Fig. 2b/c): density MLP
    out_geometry_fc(64 + 70 -> 64 -> 32 -> 16 -> 1, ReLU) on
    [sigma_feat, mean, var]; zeroed where no valid source view. Color:
    per-view [globalfeat, rgb_feat] -> base_fc(105 -> 64 -> 32) -> vis_fc
    residual -> flatten views -> rgb_fc(96 -> 32 -> 16 -> 3) + sigmoid.
  * `NeRFHead` (trainhead.py:148-163): composition; forward returns
    (cat[rgb, sigma], rgb_in).

All Dense layers use kaiming-normal init (trainhead.py:13-17).
`fused_mean_variance` (trainhead.py:20-24) is a plain mean/var here — XLA
fuses it for free.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from gpnerf_tpu.models.attention import MultiHeadAttention
from gpnerf_tpu.models.layers import MLP
from gpnerf_tpu.models.sparse_net import SparseConvNet


def fused_mean_variance(x):
    """Mean/variance across the views axis (trainhead.py:20-24).
    x: (..., V, C) -> ((..., 1, C), (..., 1, C))."""
    mean = x.mean(axis=-2, keepdims=True)
    var = jnp.mean((x - mean) ** 2, axis=-2, keepdims=True)
    return mean, var


class NeRFSigmaHead(nn.Module):
    in_feat_ch: int = 32
    n_smpl: int = 6890
    code_dim: int = 16
    attn_n_heads: int = 4
    spconv_n_layers: int = 4
    spconv_out_dim: Sequence[int] = (32, 32, 32, 32)
    compute_dtype: object = None

    def setup(self):
        self.c = self.param(
            "c", nn.initializers.normal(1.0), (self.n_smpl, self.code_dim)
        )
        d = self.code_dim // self.attn_n_heads
        self.xyzc_attn = MultiHeadAttention(
            n_head=self.attn_n_heads,
            d_model=self.code_dim,
            d_k=d,
            d_v=d,
            kv_dim=self.in_feat_ch,
            sum_residual=False,
        )
        self.xyzc_net = SparseConvNet(
            n_layers=self.spconv_n_layers,
            out_dim=tuple(self.spconv_out_dim),
            compute_dtype=self.compute_dtype,
        )
        self.out_geometry_fc = MLP(
            (64,), ("elu",), dtype=self.compute_dtype, name="out_geometry_fc"
        )

    def fuse_codes(self, smpl_feat):
        """Cross-attention fusion: query = vertex code, keys/values = that
        vertex's V projected image features (trainhead.py:48-52).

        smpl_feat: (S, V, in_feat_ch) -> fused codes (S, code_dim)."""
        code_query = self.c[:, None, :]  # (S, 1, code_dim)
        fused, _ = self.xyzc_attn(code_query, smpl_feat, smpl_feat)
        return fused[:, 0, :]

    def volume_features(self, fused_codes, vertex_rows, levels, *, train: bool):
        """Scatter fused vertex codes onto the voxel active set and run the
        sparse conv stack; returns per-level feature matrices.

        vertex_rows: int32 (CAP0,) index of the winning vertex per active
        row (-1 for padding), replicating the reference's
        SparseConvTensor(code, coord, ...) row<->vertex pairing.
        """
        safe = jnp.maximum(vertex_rows, 0)
        code = fused_codes[safe]
        code = jnp.where((vertex_rows >= 0)[:, None], code, 0.0)
        return self.xyzc_net.features(code, levels, train=train)

    def query_sigma_feat_dense(self, dense_vols, dhw_vox, out_sh_dyn):
        """Multi-scale trilinear gather against the materialized per-level
        volumes + Linear(sum(out_dim), 64) + ELU (trainhead.py:39-40,56-58).
        Returns (P, 64)."""
        feats = self.xyzc_net.query_dense(dense_vols, dhw_vox, out_sh_dyn)
        return self.out_geometry_fc(feats)

    def query_sigma_feat_octet(self, octet_vols, dhw_vox, out_sh_dyn,
                               scales=None, with_l1_occ=False):
        """Octet-table variant (demo hot path); optional uint8 tables with
        per-level dequantization scales. Two tables = the merged-coarse
        layout (query_octet2), four = one per level. with_l1_occ also
        returns the level-1 channel-sum of the queried features — the EXACT
        trilinear tight-cull occupancy (`sp_feats` of demo_render.py:274-283
        restricted to level 1): trilinear interpolation is linear, so
        channel-summing the queried features equals querying the
        channel-sum volume."""
        if len(octet_vols) == 2:
            feats = self.xyzc_net.query_octet2(
                octet_vols[0], octet_vols[1], dhw_vox, out_sh_dyn,
                scales=scales,
            )
        else:
            feats = self.xyzc_net.query_octet(
                octet_vols, dhw_vox, out_sh_dyn, scales=scales
            )
        sigma_feat = self.out_geometry_fc(feats)
        if with_l1_occ:
            nch = self.spconv_out_dim[0]
            return sigma_feat, feats[..., :nch].sum(axis=-1)
        return sigma_feat

    def query_sigma_feat_octet_folded(self, octet_l1, octet_coarse,
                                      dhw_vox, out_sh_dyn, scales=None,
                                      with_l1_occ=False):
        """`query_sigma_feat_octet` against a FOLDED merged-coarse table:
        out_geometry_fc's coarse-channel block was pre-applied to the
        coarse volume at table-build time (trilinear commutes with linear
        maps), so the queried coarse rows (64 ch) already ARE that block's
        pre-activation contribution — only the level-1 block of the linear
        runs per point: sigma_feat = ELU(f1 @ W[:nch] + fc + b)."""
        feats = self.xyzc_net.query_octet2(
            octet_l1, octet_coarse, dhw_vox, out_sh_dyn, scales=scales
        )
        nch = self.spconv_out_dim[0]
        f1 = feats[..., :nch]
        fc = feats[..., nch:]
        p = self.variables["params"]["out_geometry_fc"]["dense_0"]
        dt = f1.dtype if self.compute_dtype is None else self.compute_dtype
        pre = (
            f1.astype(dt) @ p["kernel"][:nch].astype(dt)
            + fc.astype(dt)
            + p["bias"].astype(dt)
        )
        sigma_feat = nn.elu(pre)
        if with_l1_occ:
            return sigma_feat, f1.sum(axis=-1)
        return sigma_feat

    def __call__(self, smpl_feat, vertex_rows, levels, dhw_vox, out_sh_dyn,
                 *, train: bool):
        from gpnerf_tpu.ops.sparse_conv import scatter_dense

        fused = self.fuse_codes(smpl_feat)
        level_feats = self.volume_features(fused, vertex_rows, levels, train=train)
        dense_vols = [
            scatter_dense(level_feats[i], levels[i + 1])
            for i in range(len(level_feats))
        ]
        return self.query_sigma_feat_dense(dense_vols, dhw_vox, out_sh_dyn)


class NeRFRGBHead(nn.Module):
    in_feat_ch: int = 32
    compute_dtype: object = None

    def setup(self):
        dt = self.compute_dtype
        self.base_fc = MLP((64, 32), ("elu", "elu"), dtype=dt, name="base_fc")
        self.vis_fc = MLP((32, 32), ("elu", "elu"), dtype=dt, name="vis_fc")
        self.rgb_fc = MLP((32, 16, 3), ("elu", "elu", "none"), dtype=dt, name="rgb_fc")
        self.out_geometry_fc = MLP(
            (64, 32, 16, 1), ("elu", "elu", "elu", "relu"), dtype=dt,
            name="out_geometry_fc",
        )

    def density(self, sigma_feat, mean, var, num_valid_obs):
        """Density MLP on [sigma_feat, mean, var]; sigma zeroed where a
        point has no valid source view (trainhead.py:133-137).

        sigma_feat: (..., 64); mean/var: (..., C+3); num_valid_obs: (..., 1).
        Returns sigma (..., 1)."""
        x = jnp.concatenate([sigma_feat, mean, var], axis=-1)
        sigma = self.out_geometry_fc(x)
        return jnp.where(num_valid_obs < 1, 0.0, sigma)

    def color(self, rgb_feat, mean, var):
        """Per-view color MLP + view flatten (trainhead.py:139-143).
        rgb_feat: (..., V, C+3). Returns rgb (..., 3) in [0, 1]."""
        V = rgb_feat.shape[-2]
        globalfeat = jnp.concatenate([mean, var], axis=-1)  # (..., 1, 2C+6)
        x = jnp.concatenate(
            [jnp.broadcast_to(globalfeat, rgb_feat.shape[:-1] + (globalfeat.shape[-1],)), rgb_feat],
            axis=-1,
        )
        x = self.base_fc(x)
        x = x + self.vis_fc(x / V)
        x = x.reshape(x.shape[:-2] + (V * x.shape[-1],))
        return nn.sigmoid(self.rgb_fc(x))

    def __call__(self, rgb_feat, sigma_feat, mask):
        """rgb_feat: (N_rays, N_samples, V, C+3); sigma_feat: (..., 64);
        mask: (N_rays, N_samples, V, 1). Returns (rgb_in, rgb, sigma)."""
        rgb_in = rgb_feat[..., :3]
        mean, var = fused_mean_variance(rgb_feat)
        num_valid_obs = jnp.sum(mask, axis=-2)
        sigma = self.density(sigma_feat, mean[..., 0, :], var[..., 0, :], num_valid_obs)
        rgb = self.color(rgb_feat, mean, var)
        return rgb_in, rgb, sigma


class NeRFHead(nn.Module):
    """Composition (trainhead.py:148-163)."""

    in_feat_ch: int = 32
    n_smpl: int = 6890
    code_dim: int = 16
    attn_n_heads: int = 4
    spconv_n_layers: int = 4
    spconv_out_dim: Sequence[int] = (32, 32, 32, 32)
    use_rgbhead: bool = True
    compute_dtype: object = None

    def setup(self):
        self.sigmahead = NeRFSigmaHead(
            in_feat_ch=self.in_feat_ch,
            n_smpl=self.n_smpl,
            code_dim=self.code_dim,
            attn_n_heads=self.attn_n_heads,
            spconv_n_layers=self.spconv_n_layers,
            spconv_out_dim=self.spconv_out_dim,
            compute_dtype=self.compute_dtype,
        )
        self.rgbhead = NeRFRGBHead(
            in_feat_ch=self.in_feat_ch, compute_dtype=self.compute_dtype
        )

    def volume(self, smpl_feat, vertex_rows, levels, *, train: bool):
        """Fuse vertex codes and build the sparse feature volume ONCE per
        frame. The reference rebuilds this per ray chunk during training
        (trainhead.py:48-56 runs per render_rays call — 3 redundant builds
        per step at chunk=400); hoisting it out is a free win the demo
        renderer's `encode` already exploits (SURVEY.md §3.1)."""
        fused = self.sigmahead.fuse_codes(smpl_feat)
        return self.sigmahead.volume_features(fused, vertex_rows, levels, train=train)

    def point_forward(self, query_ctx, dhw_vox, out_sh_dyn, rgb_feat, mask,
                      occupancy_cull=False):
        """Query + MLP heads for one ray chunk. `query_ctx` selects the
        multi-scale query backing (numerically identical to the reference's
        `.dense()` + grid_sample, SparseConvNet.py:105-124, either way):
          {"dense": [4 x (D,H,W,C) volumes]} — inference (one big gather);
          {"sparse": (level_feats, index_vols, shapes)} — training (keeps
          gradients on the ~20k-row sparse matrices; materializing dense
          volumes inside the differentiated step cost ~240 ms/it).

        occupancy_cull: zero sigma where the level-1 queried feature's
        channel sum is <= 0 — the progressive renderer's (and the reference
        demo_render.py:294's sp_feats > 0) empty-space cull applied in the
        training renderer. A trained head can emit positive density on
        ZERO multi-scale features (unsupervised empty space renders as fog
        on the mask-zeroed GT); this flag puts both renderers under the
        same cull so their agreement is checkpoint-independent.

        dhw_vox: (N_rays*N_samples, 3); rgb_feat: (N_rays, N_samples, V, C+3).
        Returns (raw (N_rays, N_samples, 4), rgb_in)."""
        n_rays, n_samples = rgb_feat.shape[:2]
        if "dense" in query_ctx:
            feats = self.sigmahead.xyzc_net.query_dense(
                query_ctx["dense"], dhw_vox, out_sh_dyn
            )
        else:
            level_feats, index_vols, shapes = query_ctx["sparse"]
            feats = self.sigmahead.xyzc_net.query_sparse(
                level_feats, index_vols, shapes, dhw_vox, out_sh_dyn
            )
        sigma_feat = self.sigmahead.out_geometry_fc(feats).reshape(
            n_rays, n_samples, -1
        )
        rgb_in, rgb, sigma = self.rgbhead(rgb_feat, sigma_feat, mask)
        if occupancy_cull:
            occ = feats[..., : self.spconv_out_dim[0]].sum(axis=-1) > 0
            sigma = jnp.where(
                occ.reshape(n_rays, n_samples, 1), sigma, 0.0
            )
        raw = jnp.concatenate([rgb, sigma], axis=-1)
        return raw, rgb_in

    def __call__(self, smpl_feat, vertex_rows, levels, dhw_vox, out_sh_dyn,
                 rgb_feat, mask, *, train: bool):
        """Full forward over one frame's query points (volume built once,
        dense per-level volumes materialized once)."""
        from gpnerf_tpu.ops.sparse_conv import scatter_dense

        level_feats = self.volume(smpl_feat, vertex_rows, levels, train=train)
        dense_vols = [
            scatter_dense(level_feats[i], levels[i + 1])
            for i in range(len(level_feats))
        ]
        return self.point_forward(
            {"dense": dense_vols}, dhw_vox, out_sh_dyn, rgb_feat, mask
        )


def build_head(cfg):
    """Factory mirroring trainhead.py:166-177."""
    return NeRFHead(
        in_feat_ch=cfg.encoder.out_ch,
        use_rgbhead=cfg.head.rgb.use_rgbhead,
        n_smpl=cfg.head.sigma.n_smpl,
        code_dim=cfg.head.sigma.code_dim,
        attn_n_heads=cfg.head.sigma.n_heads,
        spconv_n_layers=cfg.head.sigma.n_layers,
        spconv_out_dim=tuple(cfg.head.sigma.outdims),
    )


from gpnerf_tpu.registry import register  # noqa: E402

register("head", "trainhead", build_head)
