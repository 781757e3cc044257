"""BaseRender — the training / quick-val renderer (model composition root).

TPU-native redesign of /root/reference/libs/renders/BaseRender.py:11-403:

  * pure functions over a `variables` pytree ({'encoder': ..., 'head': ...})
    — the trainer jits and differentiates whole train steps;
  * the sparse geometry volume is built ONCE per frame (the reference
    rebuilds it per ray chunk, SURVEY.md §3.1) and queried per chunk;
  * training renders all n_rays in one chunk (1024 x 64 points is small on
    a TPU core); full-image eval maps a static-chunk loop (`lax.map`) over
    rays padded to `eval_ray_cap`;
  * all shapes static: padded voxel active set (site_cap), padded rays with
    validity masks.

Conventions preserved exactly for metric parity: world->canonical transform
(BaseRender.py:52-60), dhw voxel coords normalized by the *dynamic* per-frame
out_sh (:62-73), projection/normalization/in-bound semantics (:278-363),
distance-free alpha compositing (:75-107), THuman neg_ray flips.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp

from gpnerf_tpu.models.sparse_net import build_grid_pyramid
from gpnerf_tpu.ops.sparse_conv import SparseLevel, derive_level_tables, scatter_dense
from gpnerf_tpu.ops.compositing import raw2outputs
from gpnerf_tpu.ops.projection import gather_smpl_features, project_and_gather
from gpnerf_tpu.ops.rays import sample_points, sample_z_vals
from gpnerf_tpu.registry import register


def src_norm(imgs):
    """Source images to the normalized float frame ((x/255 - 0.5) / 0.5).

    The data pipeline ships images as raw uint8 (what was on disk) because
    host->device transfer is the training bottleneck on tunneled runtimes —
    uint8 quarters the batch bytes and the conversion is exact (images were
    uint8 originally) and free inside the jitted step. Float batches (tests,
    round-1 callers) pass through unchanged.
    """
    if imgs.dtype == jnp.uint8:
        return imgs.astype(jnp.float32) / 127.5 - 1.0
    return imgs


def homogenize(mat34_or_33, batch_dims=1):
    """(..., 3, 4) pose or (..., 3, 3) K -> (..., 4, 4)."""
    shape = mat34_or_33.shape
    eye = jnp.broadcast_to(jnp.eye(4, dtype=mat34_or_33.dtype), shape[:-2] + (4, 4))
    if shape[-1] == 4:
        return eye.at[..., :3, :4].set(mat34_or_33)
    return eye.at[..., :3, :3].set(mat34_or_33)


def camera_matrices(batch):
    """KE = K_h @ pose_h per source view (the packed 34-float camera vector
    of BaseRender.py:233-247, kept as matrices)."""
    K_h = homogenize(batch["src_Ks"])
    pose_h = homogenize(batch["src_poses"])
    return jnp.einsum("vij,vjk->vik", K_h, pose_h)


class Renderer:
    """Static render config + pure compute methods."""

    def __init__(
        self,
        encoder,
        nerfhead,
        *,
        is_train=True,
        neg_ray_train=False,
        neg_ray_val=False,
        n_rays=1024,
        n_samples=64,
        voxel_size=(0.005, 0.005, 0.005),
        chunk=2000,
        mesh_th=-1.0,
        site_cap=8192,
        level_caps=(8192, 8192, 4096, 2048),
        max_out_sh=(96, 384, 384),
        eval_chunk=8192,
        n_smpl=6890,
        occupancy_cull=False,
    ):
        self.encoder = encoder
        self.nerfhead = nerfhead
        self.is_train = is_train
        self.neg_ray_train = neg_ray_train
        self.neg_ray_val = neg_ray_val
        self.n_rays = n_rays
        self.n_samples = n_samples
        self.voxel_size = tuple(float(v) for v in voxel_size)
        self.chunk = chunk
        self.mesh_th = mesh_th
        self.site_cap = max(int(site_cap), n_smpl)
        self.level_caps = tuple(int(c) for c in level_caps)
        self.max_out_sh = tuple(int(v) for v in max_out_sh)
        self.eval_chunk = int(eval_chunk)
        self.n_smpl = n_smpl
        # apply the progressive renderer's empty-space cull (level-1
        # queried-feature channel sum > 0; reference demo_render.py:294) in
        # this renderer too — see NeRFHead.point_forward(occupancy_cull=)
        self.occupancy_cull = bool(occupancy_cull)
        self._eval_fn = None

    # ------------------------------------------------------------------
    def init_variables(self, rng, batch) -> Dict[str, Any]:
        """Parameter init. Runs on the host CPU backend: init is eager
        (op-by-op), and on a networked TPU runtime each eager op is a
        round-trip — a 512^2 ResNet init takes minutes remotely vs seconds
        on local CPU. The variables transfer to the accelerator on first
        jitted use.

        `rng` may be an int seed (preferred): a PRNGKey made OUTSIDE the
        cpu pin lands on the accelerator and the first `split` here then
        needs a device->host transfer of the key — one avoidable tunnel
        round-trip per init on a networked runtime (and the op the r5
        tunnel outage wedged on)."""
        cpu = jax.local_devices(backend="cpu")[0]
        with jax.default_device(cpu):
            if isinstance(rng, int):
                rng = jax.random.PRNGKey(rng)
            return self._init_variables_impl(rng, batch)

    def _init_variables_impl(self, rng, batch) -> Dict[str, Any]:
        r1, r2 = jax.random.split(rng)
        src = src_norm(jnp.asarray(batch["src_imgs"]))
        enc_vars = self.encoder.init(r1, src)
        featmaps = self.encoder.apply(enc_vars, src)
        pre = self.prepare_frame({k: jnp.asarray(v) for k, v in batch.items()}, featmaps)
        n = min(self.n_rays, 8)
        dummy_pts = jnp.zeros((n * self.n_samples, 3))
        dummy_rgbf = jnp.zeros(
            (n, self.n_samples, batch["src_imgs"].shape[0], featmaps.shape[-1] + 3)
        )
        dummy_mask = jnp.ones((n, self.n_samples, batch["src_imgs"].shape[0], 1))
        head_vars = self.nerfhead.init(
            r2,
            pre["smpl_feat"],
            pre["vertex_rows"],
            pre["grids"],
            dummy_pts,
            pre["out_sh"],
            dummy_rgbf,
            dummy_mask,
            train=True,
        )
        return {"encoder": enc_vars, "head": head_vars}

    # ------------------------------------------------------------------
    def prepare_frame(self, batch, featmaps, *, neg_ray=False):
        """Geometry-only per-frame preliminaries (no parameters): camera
        matrices, world SMPL vertices, per-vertex multi-view features,
        voxel active-set pyramid."""
        V, H, W = batch["src_imgs"].shape[0:3]
        KE = camera_matrices(batch)
        xyz_can = batch["feature"][:, :3]
        R = batch["Rh"]
        Th = batch["Th"].reshape(1, 3)
        smpl_xyz = xyz_can @ R.T + Th  # (S, 3) world (BaseRender.py:128-131)
        smpl_feat = gather_smpl_features(
            smpl_xyz, KE, featmaps, H, W, neg_ray=neg_ray
        )

        shapes = self._grid_shapes()
        if "lvl0_coords" in batch:
            # host-built pyramid + conv rulebooks (data/sparse_host.py):
            # the device does zero scatter/nonzero work for grid geometry
            i32 = lambda x: None if x is None else x.astype(jnp.int32)
            levels = [
                SparseLevel(
                    i32(batch[f"lvl{i}_coords"]),
                    batch[f"lvl{i}_valid"],
                    i32(batch[f"lvl{i}_nbr"]),
                    i32(batch.get(f"lvl{i}_down")),
                    shapes[i],
                )
                for i in range(5)
            ]
            vertex_rows = batch["vertex_rows"].astype(jnp.int32)
            overflows = batch["pyramid_overflows"]
        else:
            # device fallback (tiny synthetic batches, unit tests)
            cap = self.site_cap
            S = xyz_can.shape[0]
            oob = jnp.asarray(self.max_out_sh, jnp.int32)
            coords = jnp.full((cap, 3), oob, jnp.int32).at[:S].set(batch["coord"])
            valid = jnp.arange(cap) < S
            grids, overflows = build_grid_pyramid(
                coords, valid, self.max_out_sh, self.level_caps
            )
            # dedup losers must not double-inject codes: build_sparse_grid
            # marked them invalid
            valid0 = grids[0].valid
            vertex_rows = jnp.where(valid0, jnp.arange(cap), -1)
            levels = derive_level_tables(grids)
        return {
            "KE": KE,
            "smpl_xyz": smpl_xyz,
            "smpl_feat": smpl_feat,
            "grids": levels,
            "vertex_rows": vertex_rows,
            "overflows": overflows,
            "out_sh": batch["out_sh"],
            "img_hw": (H, W),
        }

    def materialize_dense(self, level_feats, levels):
        """Dense per-level feature volumes — the reference's `.dense()`
        cache (SparseConvNet.encode, SparseConvNet.py:126-143), built once
        per frame; inference queries gather rows from these."""
        return [
            scatter_dense(level_feats[i], levels[i + 1])
            for i in range(len(level_feats))
        ]

    def sparse_query_ctx(self, level_feats, levels):
        """Training/eval query context: per-level index volumes (4 small
        scatters) + the sparse feature matrices. Keeps autodiff on the
        ~20k-row matrices — materializing dense volumes inside the
        differentiated train step cost ~240 ms/it."""
        from gpnerf_tpu.ops.sparse_conv import build_index_volume

        index_vols = [
            build_index_volume(
                levels[i + 1].coords, levels[i + 1].valid, levels[i + 1].shape
            )
            for i in range(len(level_feats))
        ]
        shapes = tuple(levels[i + 1].shape for i in range(len(level_feats)))
        return {"sparse": (level_feats, index_vols, shapes)}

    def points_to_dhw_vox(self, pts, batch):
        """World points -> canonical -> level-0 voxel units (dhw), the
        reference's pts_to_can_pts + get_grid_coords numerator
        (BaseRender.py:52-73). Returns (P, 3) float."""
        Th = batch["Th"].reshape(1, 3)
        R = batch["Rh"]
        can = (pts.reshape(-1, 3) - Th) @ R
        dhw = can[:, ::-1]
        min_dhw = batch["bounds"][0][::-1]
        vs = jnp.asarray(self.voxel_size[::-1], dtype=dhw.dtype)
        return (dhw - min_dhw) / vs

    def render_chunk(
        self, head_vars, query_ctx, pre, batch, src_unnorm, featmaps,
        rays_o, rays_d, near, far, *, neg_ray, perturb, rng=None
    ):
        """One ray chunk through sampling -> gather -> heads -> compositing
        (render_rays, BaseRender.py:110-157)."""
        H, W = pre["img_hw"]
        z_vals = sample_z_vals(near, far, self.n_samples, perturb=perturb, rng=rng)
        pts = sample_points(rays_o, rays_d, z_vals)  # (Nr, S, 3)
        nr = pts.shape[0]
        dhw_vox = self.points_to_dhw_vox(pts, batch)

        rgb_feat, mask = project_and_gather(
            pts.reshape(-1, 3), pre["KE"], src_unnorm, featmaps, H, W,
            neg_ray=neg_ray,
        )
        rgb_feat = rgb_feat.reshape(nr, self.n_samples, -1, rgb_feat.shape[-1])
        mask = mask.reshape(nr, self.n_samples, -1)
        pixel_mask = mask.sum(axis=2) > 1  # >=2 observations (BaseRender.py:139)

        raw, rgb_in = self.nerfhead.apply(
            head_vars,
            query_ctx,
            dhw_vox,
            pre["out_sh"],
            rgb_feat,
            mask[..., None],
            occupancy_cull=self.occupancy_cull,
            method="point_forward",
        )
        # compositing always runs float32: the shifted cumprod accumulates
        # across samples and bf16 module outputs would degrade it
        raw = raw.astype(jnp.float32)
        rgb_in = rgb_in.astype(jnp.float32)
        comp = raw2outputs(raw, z_vals, pixel_mask, neg=neg_ray)
        rgb_in_map = (comp.weights[..., None, None] * rgb_in).sum(axis=1)
        return {
            "rgb_map": comp.rgb_map,
            "disp_map": comp.disp_map,
            "acc_map": comp.acc_map,
            "depth_map": comp.depth_map,
            "alpha": comp.weights,
            "z_vals": z_vals,
            "rgb_in_map": rgb_in_map[:, 0],
            "pixel_mask": comp.mask,
        }

    # ------------------------------------------------------------------
    def render_train(self, variables, batch, rng):
        """Training forward: one frame, n_rays rays, volume built once.
        Returns (ret, updated_batch_stats)."""
        neg_ray = self.neg_ray_train
        src = src_norm(batch["src_imgs"])
        featmaps = self.encoder.apply(variables["encoder"], src)
        src_unnorm = src * 0.5 + 0.5
        pre = self.prepare_frame(batch, featmaps, neg_ray=neg_ray)

        head_vars = variables["head"]
        level_feats, mutated = self.nerfhead.apply(
            head_vars,
            pre["smpl_feat"],
            pre["vertex_rows"],
            pre["grids"],
            train=True,
            method="volume",
            mutable=["batch_stats"],
        )
        query_ctx = self.sparse_query_ctx(level_feats, pre["grids"])
        ret = self.render_chunk(
            {"params": head_vars["params"], **mutated},
            query_ctx, pre, batch, src_unnorm, featmaps,
            batch["ray_o"], batch["ray_d"], batch["near"], batch["far"],
            neg_ray=neg_ray, perturb=True, rng=rng,
        )
        ret["overflows"] = pre["overflows"]
        return ret, mutated["batch_stats"]

    # ------------------------------------------------------------------
    def render_eval_fn(self):
        """Jitted full-image eval renderer (BaseRender eval path: all padded
        box rays, chunked, no perturb, frozen batch stats)."""
        if self._eval_fn is not None:
            return self._eval_fn

        @jax.jit
        def _eval(variables, batch):
            neg_ray = self.neg_ray_val
            src = src_norm(batch["src_imgs"])
            featmaps = self.encoder.apply(variables["encoder"], src)
            src_unnorm = src * 0.5 + 0.5
            pre = self.prepare_frame(batch, featmaps, neg_ray=neg_ray)
            level_feats = self.nerfhead.apply(
                variables["head"],
                pre["smpl_feat"],
                pre["vertex_rows"],
                pre["grids"],
                train=False,
                method="volume",
            )

            ray_cap = batch["ray_o"].shape[0]
            chunk = min(self.eval_chunk, ray_cap)
            n_chunks = ray_cap // chunk
            assert n_chunks * chunk == ray_cap, "eval_ray_cap % eval_chunk != 0"

            query_ctx = self.sparse_query_ctx(level_feats, pre["grids"])

            def body(args):
                ro, rd, nr_, fr_ = args
                out = self.render_chunk(
                    variables["head"], query_ctx, pre, batch, src_unnorm,
                    featmaps, ro, rd, nr_, fr_,
                    neg_ray=neg_ray, perturb=False,
                )
                return (
                    out["rgb_map"],
                    out["depth_map"],
                    out["acc_map"],
                    out["rgb_in_map"],
                )

            ro = batch["ray_o"].reshape(n_chunks, chunk, 3)
            rd = batch["ray_d"].reshape(n_chunks, chunk, 3)
            nr_ = batch["near"].reshape(n_chunks, chunk)
            fr_ = batch["far"].reshape(n_chunks, chunk)
            rgb, depth, acc, rgb_in = jax.lax.map(body, (ro, rd, nr_, fr_))
            return {
                "rgb_map": rgb.reshape(ray_cap, 3),
                "depth_map": depth.reshape(ray_cap),
                "acc_map": acc.reshape(ray_cap),
                "rgb_in_map": rgb_in.reshape(ray_cap, 3),
            }

        self._eval_fn = _eval
        return _eval

    def render(self, variables, batch, rng=None):
        """Reference-style entry (`Renderer.render`, BaseRender.py:211-274):
        train mode renders the sampled rays, eval mode the whole image."""
        if self.is_train and rng is not None:
            ret, _ = self.render_train(variables, batch, rng)
            return ret
        return self.render_eval_fn()(variables, batch)

    # ------------------------------------------------------------------
    # mesh extraction (use_rgbhead=False branch, BaseRender.py:255-272 /
    # demo_render.py:249-268,366-376)
    # ------------------------------------------------------------------
    def _grid_shapes(self):
        D, H, W = self.max_out_sh
        return [
            (D >> i, H >> i, W >> i) for i in range(5)
        ]

    def _mesh_fns(self):
        if getattr(self, "_mesh_jits", None) is not None:
            return self._mesh_jits
        from gpnerf_tpu.models.heads import fused_mean_variance

        @jax.jit
        def vol_fn(variables, batch):
            featmaps = self.encoder.apply(
                variables["encoder"], src_norm(batch["src_imgs"])
            )
            pre = self.prepare_frame(batch, featmaps, neg_ray=self.neg_ray_val)
            level_feats = self.nerfhead.apply(
                variables["head"], pre["smpl_feat"], pre["vertex_rows"],
                pre["grids"], train=False, method="volume",
            )
            dense_vols = self.materialize_dense(level_feats, pre["grids"])
            return featmaps, pre["KE"], dense_vols, pre["out_sh"]

        @jax.jit
        def chunk_fn(variables, featmaps, KE, dense_vols, out_sh,
                     batch, pts):
            dhw = self.points_to_dhw_vox(pts, batch)
            sigma_feat = self.nerfhead.apply(
                variables["head"], dense_vols, dhw, out_sh,
                method=lambda m, *a: m.sigmahead.query_sigma_feat_dense(*a),
            )
            H, W = batch["src_imgs"].shape[1:3]
            rgb_feat, vm = project_and_gather(
                pts, KE, src_norm(batch["src_imgs"]) * 0.5 + 0.5, featmaps, H, W,
                neg_ray=self.neg_ray_val,
            )
            mean, var = fused_mean_variance(rgb_feat)
            nvo = vm.sum(axis=-1, keepdims=True)
            sigma = self.nerfhead.apply(
                variables["head"], sigma_feat, mean[:, 0], var[:, 0], nvo,
                method=lambda m, *a: m.rgbhead.density(*a),
            )
            return sigma[:, 0]

        self._mesh_jits = (vol_fn, chunk_fn)
        return self._mesh_jits

    def render_mesh(self, variables, batch_np, chunk=65536):
        """Sigma over the visual-hull grid points -> alpha cube -> padded
        marching cubes at mesh_th -> mesh. Follows the demo renderer's mesh
        branch (density MLP sigma; demo_render.py:294-314,366-376); the
        reference BaseRender mesh branch reads raw channel 0 — the red
        component — as sigma (BaseRender.py:267), which we treat as a quirk
        and do not reproduce."""
        import numpy as np

        from gpnerf_tpu.ops.marching_cubes import marching_cubes
        from gpnerf_tpu.utils.mesh_io import Trimesh

        vol_fn, chunk_fn = self._mesh_fns()
        batch = {
            k: jnp.asarray(v)
            for k, v in batch_np.items()
            if k not in ("pts", "inside")
        }
        featmaps, KE, dense_vols, out_sh = vol_fn(variables, batch)

        pts = np.asarray(batch_np["pts"])
        inside = np.asarray(batch_np["inside"]).astype(bool)
        sh = pts.shape[:-1]
        sel = np.flatnonzero(inside.reshape(-1))
        flat = pts.reshape(-1, 3)[sel]
        n = len(flat)
        n_pad = (-n) % chunk
        flat = np.concatenate([flat, np.zeros((n_pad, 3), np.float32)])
        sigmas = []
        for i in range(0, len(flat), chunk):
            s = chunk_fn(
                variables, featmaps, KE, dense_vols, out_sh, batch,
                jnp.asarray(flat[i : i + chunk]),
            )
            sigmas.append(np.asarray(s))
        sigma = np.concatenate(sigmas)[:n]
        alpha = 1.0 - np.exp(-sigma)

        cube = np.zeros(int(np.prod(sh)), np.float64)
        cube[sel] = alpha
        cube = cube.reshape(sh)
        cube = np.pad(cube, 10, mode="constant")
        vertices, triangles = marching_cubes(cube, self.mesh_th)
        return {"cube": cube, "mesh": Trimesh(vertices, triangles)}


def build_render(cfg):
    """Factory mirroring BaseRender.build_render (BaseRender.py:367-403),
    wired through the string registry (the reference's config-driven dynamic
    import, tools/train.py:143)."""
    from gpnerf_tpu.registry import get

    encoder = get("encoder", cfg.encoder.file)(cfg)
    nerfhead = get("head", cfg.head.file)(cfg)
    if cfg.tpu.train_dtype == "bfloat16":
        # mixed-precision training: float32 master params (flax `dtype`
        # casts inputs+params to bf16 per matmul/conv; optimizer state and
        # BN/IN statistics stay float32) — VERDICT r3 #4
        import jax.numpy as _jnp

        encoder = encoder.clone(compute_dtype=_jnp.bfloat16)
        nerfhead = nerfhead.clone(compute_dtype=_jnp.bfloat16)
    neg_ray_train = "thuman" in cfg.dataset.train.name
    neg_ray_val = "thuman" in cfg.dataset.test.name
    mesh_th = (1.0 / cfg.test.mesh_th) if not cfg.head.rgb.use_rgbhead else -1.0
    return Renderer(
        encoder,
        nerfhead,
        is_train=True,
        neg_ray_train=neg_ray_train,
        neg_ray_val=neg_ray_val,
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
        occupancy_cull=cfg.tpu.base_occupancy_cull,
    )


register("render", "BaseRender", build_render)
