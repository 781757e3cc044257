"""Stage-prefix profiler for the progressive renderer (run on TPU).

Times cumulative prefixes of the demo pipeline as separate jits; the delta
between consecutive prefixes approximates each stage's cost (fusion across
stage boundaries is lost, so treat as upper bounds)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.models.heads import fused_mean_variance
from gpnerf_tpu.models.sparse_net import occupancy_volume
from gpnerf_tpu.ops.grid_sample import trilinear_dense_gather
from gpnerf_tpu.ops.projection import project_and_gather
from gpnerf_tpu.ops.rays import pixel_rays, ray_aabb_near_far, sample_points, sample_z_vals
from gpnerf_tpu.registry import get
from gpnerf_tpu.render.demo import _compact


def main():
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.dataset.H = 512
    cfg.dataset.W = 512
    cfg.dataset.ratio = 1.0
    cfg.head.sigma.code_dim = 32
    cfg.render.file = "demo_render"
    cfg.freeze()

    np.random.seed(0)
    ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    render = get("render", cfg.render.file)(cfg)
    b = ds[0]
    variables = render.init_variables(jax.random.PRNGKey(0), b)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    # warm BN stats
    featmaps = render.encoder.apply(variables["encoder"], batch["src_imgs"])
    pre0 = render.prepare_frame(batch, featmaps)
    hv = variables["head"]
    warm = jax.jit(lambda hv: render.nerfhead.apply(
        hv, pre0["smpl_feat"], pre0["vertex_rows"], pre0["grids"], train=True,
        method=lambda m, *a, **k: m.volume(*a, **k), mutable=["batch_stats"])[1])
    for _ in range(25):
        hv = {"params": hv["params"], **warm(hv)}
    variables = {"encoder": variables["encoder"], "head": hv}

    self = render

    def stage_A(variables, batch):
        return self.encoder.apply(variables["encoder"], batch["src_imgs"])

    def stage_C(variables, batch):
        featmaps = stage_A(variables, batch)
        pre = self.prepare_frame(batch, featmaps)
        level_feats = self.nerfhead.apply(
            variables["head"], pre["smpl_feat"], pre["vertex_rows"], pre["grids"],
            train=False, method=lambda m, *a, **k: m.volume(*a, **k))
        return featmaps, pre, level_feats

    def stage_D(variables, batch):
        featmaps, pre, level_feats = stage_C(variables, batch)
        masks3d = occupancy_volume(level_feats, pre["grids"])
        occ = masks3d > self.occupancy_threshold
        Himg, Wimg = batch["tar_img"].shape[0:2]
        D1, H1, W1 = masks3d.shape
        vd = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 0)
        vh = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 1)
        vw = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 2)
        vox_xyz = jnp.stack([vw, vh, vd], axis=-1).astype(jnp.float32) * 2.0
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        can_pts = vox_xyz * vs + batch["bounds"][0]
        R = batch["Rh"]; Th = batch["Th"].reshape(1, 3)
        pts_w = (can_pts.reshape(-1, 3) @ R.T + Th).reshape(D1, H1, W1, 3)
        big = jnp.float32(1e9)
        occ3 = occ[..., None]
        min_xyz = jnp.where(occ3, pts_w, big).min(axis=(0, 1, 2)) - jnp.asarray([0., 0., .05])
        max_xyz = jnp.where(occ3, pts_w, -big).max(axis=(0, 1, 2)) + jnp.asarray([0., 0., .05])
        can_bounds = jnp.stack([min_xyz, max_xyz])
        tp = batch["target_pose"]; tK = batch["target_K"]
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
        pix_idx, ray_ok, _ = _compact(pixmask > 0, self.ray_cap)
        jj = jnp.minimum(pix_idx, oob - 1) // Wimg
        ii = jnp.minimum(pix_idx, oob - 1) % Wimg
        xy1 = jnp.stack([ii, jj, jnp.ones_like(ii)], -1).astype(jnp.float32)
        rays_o, rays_d = pixel_rays(xy1, batch["target_K_inv"], tp[:, :3], tp[:, 3:])
        near, far, mab = ray_aabb_near_far(rays_o, rays_d, can_bounds)
        ray_ok = ray_ok & mab
        z_vals = sample_z_vals(near, far, self.n_samples, perturb=False)
        pts = sample_points(rays_o, rays_d, z_vals)
        return featmaps, pre, level_feats, masks3d, pts, ray_ok, pix_idx

    def stage_E(variables, batch):
        featmaps, pre, level_feats, masks3d, pts, ray_ok, pix_idx = stage_D(variables, batch)
        out_sh = pre["out_sh"]
        P = self.ray_cap * self.n_samples
        dhw_vox = self.points_to_dhw_vox(pts, batch)
        size1 = out_sh // 2
        pos1 = dhw_vox / out_sh.astype(jnp.float32) * (size1 - 1).astype(jnp.float32)
        sp = trilinear_dense_gather(masks3d, pos1, dyn_size=size1)
        point_ok = (sp > 0) & jnp.repeat(ray_ok, self.n_samples)
        sig_idx, sig_ok, _ = _compact(point_ok, self.sigma_cap)
        safe = jnp.minimum(sig_idx, P - 1)
        pts_c = pts.reshape(P, 3)[safe]
        dhw_c = dhw_vox[safe]
        Hs, Ws = batch["src_imgs"].shape[1:3]
        rgb_feat, vm = project_and_gather(pts_c, pre["KE"], batch["src_imgs"]*0.5+0.5,
                                          featmaps, Hs, Ws)
        return featmaps, pre, level_feats, rgb_feat, vm, dhw_c, sig_idx, sig_ok

    def stage_F(variables, batch):
        featmaps, pre, level_feats, rgb_feat, vm, dhw_c, sig_idx, sig_ok = stage_E(variables, batch)
        sigma_feat = self.nerfhead.apply(
            variables["head"], level_feats, pre["grids"], dhw_c, pre["out_sh"],
            method=lambda m, *a: m.sigmahead.query_sigma_feat(*a))
        mean, var = fused_mean_variance(rgb_feat)
        nvo = vm.sum(-1, keepdims=True)
        sigma = self.nerfhead.apply(
            variables["head"], sigma_feat, mean[:, 0], var[:, 0], nvo,
            method=lambda m, *a: m.rgbhead.density(*a))[:, 0]
        return sigma, rgb_feat, mean, var, sig_idx, sig_ok

    stages = {
        "A encoder": stage_A,
        "C +volume": stage_C,
        "D +occupancy/rays": stage_D,
        "E +cull/gather": stage_E,
        "F +sigma": stage_F,
        "G full": self._demo_impl,
    }
    prev = 0.0
    for name, fn in stages.items():
        jf = jax.jit(fn)
        t0 = time.time()
        jax.block_until_ready(jf(variables, batch))
        compile_t = time.time() - t0
        ts = []
        for _ in range(4):
            t0 = time.time()
            jax.block_until_ready(jf(variables, batch))
            ts.append(time.time() - t0)
        t = min(ts)
        print(f"{name:22s} total {t*1000:8.1f} ms  (delta {(t-prev)*1000:8.1f} ms, compile {compile_t:.0f}s)")
        prev = t


if __name__ == "__main__":
    main()
