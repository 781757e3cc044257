"""DemoRender — the geometry-guided progressive inference renderer.

TPU-native redesign of /root/reference/libs/renders/demo_render.py:96-498
(the paper's "geometry-guided progressive" pipeline, selected by
`render.file demo_render` for all published evaluations, test.sh:2-7):

  1. encode source views, fuse vertex codes, build the sparse volume ONCE
     per frame (the reference's `SparseConvNet.encode`);
  2. derive the occupancy field and the occupied-voxel set; tight world
     AABB from occupied voxels (:166-175);
  3. splat occupied voxels into the target view to mark candidate pixels;
     form rays only there (:179-211) — compacted to a static `ray_cap`;
  4. ray/AABB near+far, 64 uniform samples (:212-245);
  5. occupancy-cull sample points (trilinear occupancy > 0, :270-283) —
     compacted to a static `sigma_cap`;
  6. density for survivors (:294-308); alpha-cull (alpha > 1e-14, :316-326)
     — compacted to `rgb_cap` — color head on the survivors;
  7. scatter back and composite into the output image (:334-353).

The reference's dynamic boolean indexing becomes jnp.nonzero(size=CAP)
compaction with overflow counters; everything is one jitted function with
static shapes. Stage timing (`time_slots`) is available via profile mode
(stage-split jits); the headline rtime/etime are measured host-side around
the blocking calls, matching how the reference's evaluate averages rtime
(BaseTrainer.py:276-280).
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp

from gpnerf_tpu.models.heads import fused_mean_variance
from gpnerf_tpu.models.sparse_net import occupancy_volume
from gpnerf_tpu.ops.compositing import composite_scattered
from gpnerf_tpu.ops.projection import project_and_gather
from gpnerf_tpu.ops.rays import pixel_rays, ray_aabb_near_far, sample_points, sample_z_vals
from gpnerf_tpu.registry import register
from gpnerf_tpu.render.base import Renderer as BaseRenderer


def _compact(mask_flat, cap):
    """Static-size index compaction. Returns (idx (cap,), ok (cap,),
    overflow)."""
    n = mask_flat.shape[0]
    (idx,) = jnp.nonzero(mask_flat, size=cap, fill_value=n)
    ok = idx < n
    overflow = jnp.maximum(mask_flat.sum() - cap, 0)
    return idx, ok, overflow


class Renderer(BaseRenderer):
    """Adds the progressive full-image path on top of BaseRender."""

    def __init__(self, *args, ray_cap=65536, sigma_cap=1048576, rgb_cap=262144,
                 occupancy_threshold=0.1, compute_dtype=None, tight_cull=False,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.ray_cap = int(ray_cap)
        self.sigma_cap = int(sigma_cap)
        self.rgb_cap = int(rgb_cap)
        self.occupancy_threshold = float(occupancy_threshold)
        self.compute_dtype = compute_dtype  # bf16 halves gather/MXU bytes
        # tight_cull: cull samples against the level-1-only occupancy (body
        # surface +-1 voxel) instead of the reference's sum-over-levels field
        # whose coarse levels blanket ~8 cm around the body. Points outside
        # the tight field have near-zero trained density, so this trades a
        # negligible metric delta for ~5x fewer density evaluations.
        self.tight_cull = bool(tight_cull)
        self._demo_jit = None

    # ------------------------------------------------------------------
    def _demo_impl(self, variables, batch, stop_stage=None):
        """stop_stage (static): 'volume' | 'rays' | 'cull' | 'sigma' | None —
        truncate the pipeline for stage profiling (returns a checksum that
        forces the intermediates)."""
        neg_ray = self.neg_ray_val
        head_vars = variables["head"]
        apply = lambda method, *a: self.nerfhead.apply(head_vars, *a, method=method)

        featmaps = self.encoder.apply(variables["encoder"], batch["src_imgs"])
        src_unnorm = batch["src_imgs"] * 0.5 + 0.5
        pre = self.prepare_frame(batch, featmaps, neg_ray=neg_ray)
        Himg, Wimg = batch["tar_img"].shape[0:2]
        grids = pre["grids"]
        out_sh = pre["out_sh"]

        # (2) volume + occupancy (demo_render.py:154-165)
        level_feats = apply(
            lambda m, *a: m.volume(*a, train=False),
            pre["smpl_feat"], pre["vertex_rows"], grids,
        )
        masks3d = occupancy_volume(level_feats, grids)  # static level-1 res
        occ = masks3d > self.occupancy_threshold
        if self.compute_dtype is not None:
            # per-point stages run reduced precision: gather tables and the
            # gathered rows halve their HBM traffic
            level_feats = [f.astype(self.compute_dtype) for f in level_feats]
            featmaps = featmaps.astype(self.compute_dtype)
            src_unnorm = src_unnorm.astype(self.compute_dtype)
        # materialize dense per-level volumes once per frame: the per-point
        # multi-scale query then gathers rows directly (no index-volume
        # indirection) — the TPU analog of the reference's `.dense()` cache
        # in SparseConvNet.encode (SparseConvNet.py:126-143)
        from gpnerf_tpu.ops.sparse_conv import scatter_dense

        dense_vols = [
            scatter_dense(level_feats[i], grids[i + 1]) for i in range(4)
        ]
        if stop_stage == "volume":
            return {"dbg": sum(v.sum() for v in dense_vols) + masks3d.sum()}

        # occupied voxels -> world points (dense masked; no extraction)
        D1, H1, W1 = masks3d.shape
        vd = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 0)
        vh = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 1)
        vw = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 2)
        # mask_xyz * 2.0 level-0 units, xyz order (demo_render.py:140-143,166)
        vox_xyz = jnp.stack([vw, vh, vd], axis=-1).astype(jnp.float32) * 2.0
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        can_pts = vox_xyz * vs + batch["bounds"][0]
        R = batch["Rh"]
        Th = batch["Th"].reshape(1, 3)
        pts_w = (can_pts.reshape(-1, 3) @ R.T + Th).reshape(D1, H1, W1, 3)

        big = jnp.float32(1e9)
        occ3 = occ[..., None]
        min_xyz = jnp.where(occ3, pts_w, big).min(axis=(0, 1, 2))
        max_xyz = jnp.where(occ3, pts_w, -big).max(axis=(0, 1, 2))
        min_xyz = min_xyz - jnp.asarray([0.0, 0.0, 0.05])
        max_xyz = max_xyz + jnp.asarray([0.0, 0.0, 0.05])
        can_bounds = jnp.stack([min_xyz, max_xyz])  # (demo :168-175)

        # (3) splat occupied voxels into the target view (:179-199)
        tp = batch["target_pose"]  # (3, 4)
        tK = batch["target_K"]
        cam = pts_w.reshape(-1, 3) @ tp[:, :3].T + tp[:, 3]
        pix = cam @ tK.T
        xy = pix[:, :2] / jnp.maximum(pix[:, 2:3], 1e-9)
        occ_flat = occ.reshape(-1)
        minx = jnp.clip(jnp.floor(xy[:, 0]).astype(jnp.int32), 0, Wimg - 1)
        miny = jnp.clip(jnp.floor(xy[:, 1]).astype(jnp.int32), 0, Himg - 1)
        maxx = jnp.clip(minx + 1, 0, Wimg - 1)
        maxy = jnp.clip(miny + 1, 0, Himg - 1)
        pixmask = jnp.zeros((Himg * Wimg,), jnp.int32)
        oob = Himg * Wimg
        for yy, xx in ((miny, minx), (maxy, minx), (miny, maxx), (maxy, maxx)):
            tgt = jnp.where(occ_flat, yy * Wimg + xx, oob)
            pixmask = pixmask.at[tgt].set(1, mode="drop")

        # (3b) ray extraction (:200-211)
        pix_idx, ray_ok, ray_overflow = _compact(pixmask > 0, self.ray_cap)
        jj = jnp.minimum(pix_idx, oob - 1) // Wimg
        ii = jnp.minimum(pix_idx, oob - 1) % Wimg
        xy1 = jnp.stack([ii, jj, jnp.ones_like(ii)], axis=-1).astype(jnp.float32)
        rays_o, rays_d = pixel_rays(
            xy1, batch["target_K_inv"], tp[:, :3], tp[:, 3:]
        )

        # (4) near/far + samples (:212-245)
        near, far, mask_at_box = ray_aabb_near_far(
            rays_o, rays_d, can_bounds, neg_ray=neg_ray
        )
        ray_ok = ray_ok & mask_at_box
        z_vals = sample_z_vals(near, far, self.n_samples, perturb=False)
        pts = sample_points(rays_o, rays_d, z_vals)  # (ray_cap, S, 3)
        P = self.ray_cap * self.n_samples
        if stop_stage == "rays":
            return {"dbg": pts.sum() + ray_ok.sum()}

        # (5) occupancy cull (:270-283). The reference keeps points whose
        # trilinear occupancy sample is > 0, i.e. any corner of the point's
        # cell is occupied. Equivalent-or-looser single-tap form: one-voxel
        # dilation of the binary occupancy, nearest-neighbor lookup — 1
        # byte-sized gather per point instead of 8 float taps (the cull is
        # conservative: keeping a superset only adds a few points
        # downstream). Candidate positions are computed per-ray affinely so
        # no (ray_cap * n_samples, 3) point buffers are materialized.
        dhw_vox = self.points_to_dhw_vox(pts, batch)  # (P, 3) level-0 units
        size1 = out_sh // 2
        pos1 = dhw_vox / out_sh.astype(jnp.float32) * (size1 - 1).astype(jnp.float32)

        if self.tight_cull:
            cull_vol = occupancy_volume(level_feats, grids, levels=(0,))
        else:
            cull_vol = masks3d
        occb = cull_vol > 0
        for ax in range(3):
            occb = occb | jnp.roll(occb, 1, axis=ax) | jnp.roll(occb, -1, axis=ax)
        occb = occb.astype(jnp.uint8)  # byte gathers: 4x less random traffic
        D1c, H1c, W1c = occb.shape
        cell = jnp.round(pos1).astype(jnp.int32)
        inb = jnp.all((cell >= 0) & (cell < size1), axis=-1)
        cellc = jnp.clip(cell, 0, jnp.asarray([D1c - 1, H1c - 1, W1c - 1]))
        flat_idx = (cellc[:, 0] * H1c + cellc[:, 1]) * W1c + cellc[:, 2]
        point_ok = (
            (occb.reshape(-1)[flat_idx] > 0)
            & inb
            & jnp.repeat(ray_ok, self.n_samples)
        )
        if stop_stage == "cull_occ":
            return {"dbg": point_ok.sum()}
        # compact in SAMPLE-major order: if the capacity overflows, the
        # dropped points are the farthest samples uniformly across rays
        # (graceful degradation) instead of whole image regions (scan-order
        # truncation would cut the bottom of the body off)
        point_ok_t = point_ok.reshape(self.ray_cap, self.n_samples).T.reshape(-1)
        sig_idx_t, sig_ok, sig_overflow = _compact(point_ok_t, self.sigma_cap)
        s_of = jnp.minimum(sig_idx_t, P - 1) // self.ray_cap
        r_of = jnp.minimum(sig_idx_t, P - 1) % self.ray_cap
        sig_idx = jnp.where(sig_ok, r_of * self.n_samples + s_of, P)

        # recompute compacted points from per-ray tables (65k-row gathers)
        # instead of gathering rows of the 50MB (P, 3) buffers
        t_of = jnp.linspace(0.0, 1.0, self.n_samples)[s_of]
        z_of = near[r_of] * (1.0 - t_of) + far[r_of] * t_of
        pts_c = rays_o[r_of] + rays_d[r_of] * z_of[:, None]
        dhw_c = self.points_to_dhw_vox(pts_c, batch)
        if stop_stage == "cull_compact":
            return {"dbg": pts_c.sum() + dhw_c.sum()}

        # project + gather only for survivors (demo projector.compute :284)
        Hsrc, Wsrc = batch["src_imgs"].shape[1:3]
        rgb_feat, view_mask = project_and_gather(
            pts_c, pre["KE"], src_unnorm, featmaps, Hsrc, Wsrc, neg_ray=neg_ray
        )  # (sigma_cap, V, C+3), (sigma_cap, V)
        if stop_stage == "cull":
            return {"dbg": rgb_feat.sum().astype(jnp.float32) + view_mask.sum()}

        # (6) density (:294-314)
        sigma_feat = apply(
            lambda m, *a: m.sigmahead.query_sigma_feat_dense(*a),
            dense_vols, dhw_c, out_sh,
        )  # (sigma_cap, 64)
        mean, var = fused_mean_variance(rgb_feat)  # (sigma_cap, 1, C+3)
        num_valid_obs = view_mask.sum(axis=-1, keepdims=True)
        sigma = apply(
            lambda m, *a: m.rgbhead.density(*a),
            sigma_feat, mean[:, 0], var[:, 0], num_valid_obs,
        )[:, 0]
        sigma = jnp.where(sig_ok, sigma.astype(jnp.float32), 0.0)
        alpha = 1.0 - jnp.exp(-sigma)
        if stop_stage == "sigma":
            return {"dbg": alpha.sum()}

        # (7) alpha cull -> color head (:316-333)
        rgb_sel, rgb_ok, rgb_overflow = _compact(
            (alpha > 1e-14) & sig_ok, self.rgb_cap
        )
        safe_rgb = jnp.minimum(rgb_sel, self.sigma_cap - 1)
        rgb = apply(
            lambda m, *a: m.rgbhead.color(*a),
            rgb_feat[safe_rgb][:, None],
            mean[safe_rgb][:, None],
            var[safe_rgb][:, None],
        )[:, 0].astype(jnp.float32)  # (rgb_cap, 3); composite in f32

        # (8) scatter + composite (:334-353)
        hold_alpha = (
            jnp.zeros((P,)).at[jnp.where(sig_ok, sig_idx, P)].set(alpha, mode="drop")
        )
        rgb_point_idx = jnp.where(rgb_ok, sig_idx[safe_rgb], P)
        hold_rgb = (
            jnp.zeros((P, 3)).at[rgb_point_idx].set(rgb, mode="drop")
        )
        rgb_map, weights = composite_scattered(
            hold_rgb, hold_alpha, self.ray_cap, self.n_samples
        )
        rgb_map = jnp.where(ray_ok[:, None], rgb_map, 0.0)

        pred_flat = (
            jnp.zeros((Himg * Wimg, 3))
            .at[jnp.where(ray_ok, pix_idx, oob)]
            .set(rgb_map, mode="drop")
        )
        maskimg_flat = (
            jnp.zeros((Himg * Wimg,), bool)
            .at[jnp.where(ray_ok, pix_idx, oob)]
            .set(True, mode="drop")
        )
        return {
            "rgb_map": rgb_map,
            "pred_img": pred_flat.reshape(Himg, Wimg, 3),
            "mask_at_box": maskimg_flat,
            "ray_pix_idx": pix_idx,
            "ray_ok": ray_ok,
            "overflows": jnp.stack([ray_overflow, sig_overflow, rgb_overflow]),
            "can_bounds": can_bounds,
        }

    # ------------------------------------------------------------------
    def render_demo_fn(self):
        if self._demo_jit is None:
            self._demo_jit = jax.jit(self._demo_impl)
        return self._demo_jit

    def render(self, variables, batch, rng=None):
        """Reference-style entry (demo_render.render :429-498): returns the
        full dict plus host-measured etime/rtime."""
        fn = self.render_demo_fn()
        t0 = time.time()
        ret = jax.block_until_ready(fn(variables, batch))
        ret = dict(ret)
        ret["etime"] = 0.0  # folded into the fused program; see profile()
        ret["rtime"] = time.time() - t0
        return ret

    def profile(self, variables, batch) -> Dict[str, Any]:
        """Per-stage wall-clock (the reference's time_slots harness,
        demo_render.py:97-357): times encoder and the progressive remainder
        separately (stage-split jits under-measure fusion, so only the
        coarse split is reported)."""
        enc = jax.jit(
            lambda v, b: self.encoder.apply(v["encoder"], b["src_imgs"])
        )
        t0 = time.time()
        jax.block_until_ready(enc(variables, batch))
        etime = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(self.render_demo_fn()(variables, batch))
        rtime = time.time() - t0
        return {"etime": etime, "rtime": rtime}


def build_render(cfg):
    """Factory mirroring demo_render.build_render (demo_render.py:635-671)."""
    from gpnerf_tpu.registry import get

    compute_dtype = (
        jnp.bfloat16 if cfg.tpu.matmul_dtype == "bfloat16" else None
    )
    encoder = get("encoder", cfg.encoder.file)(cfg).clone(
        compute_dtype=compute_dtype
    )
    nerfhead = get("head", cfg.head.file)(cfg).clone(compute_dtype=compute_dtype)
    mesh_th = (1.0 / cfg.test.mesh_th) if not cfg.head.rgb.use_rgbhead else -1.0
    return Renderer(
        encoder,
        nerfhead,
        is_train=False,
        neg_ray_train="thuman" in cfg.dataset.train.name,
        neg_ray_val="thuman" in cfg.dataset.test.name,
        n_rays=cfg.train.n_rays,
        n_samples=cfg.train.n_samples,
        voxel_size=tuple(cfg.dataset.voxel_size),
        chunk=cfg.dataset.test.chunk,
        mesh_th=mesh_th,
        site_cap=cfg.tpu.site_cap,
        level_caps=tuple(cfg.tpu.level_caps),
        max_out_sh=tuple(cfg.tpu.max_out_sh),
        eval_chunk=cfg.tpu.eval_chunk,
        n_smpl=cfg.head.sigma.n_smpl,
        ray_cap=cfg.tpu.ray_cap,
        sigma_cap=cfg.tpu.sigma_cap,
        rgb_cap=cfg.tpu.rgb_cap,
        compute_dtype=compute_dtype,
        tight_cull=cfg.tpu.tight_cull,
    )


register("render", "DemoRender", build_render)
