"""DemoRender — the geometry-guided progressive inference renderer.

TPU-native redesign of /root/reference/libs/renders/demo_render.py:96-498
(the paper's "geometry-guided progressive" pipeline, selected by
`render.file demo_render` for all published evaluations, test.sh:2-7):

  1. encode source views (a SEPARATE jit so encoder time is reported as
     `etime` like the reference, demo_render.py:429-498);
  2. fuse vertex codes, build the sparse volume ONCE per frame (the
     reference's `SparseConvNet.encode`), derive the occupancy field;
  3. splat occupied voxels into the target view to mark candidate pixels;
     form rays only there (:179-211) — compacted to a static `ray_cap`.
     With `tight_cull` the splat source is the compacted level-1 active set
     (<= level_caps[0] rows) instead of the reference's dense occupied-voxel
     walk over the full level-1 volume (~1.8M candidates) — a pure-speed
     change because tight culling kills samples outside that set anyway;
  4. ray/AABB near+far, the reference's 64 uniform samples (:212-245);
  5. occupancy-cull sample points (trilinear occupancy > 0, :270-283):
     a per-ray rank-compaction keeps the nearest `samples_per_ray` occupied
     samples of each ray in a rectangular (ray, K) frame — sample POSITIONS
     are exactly the reference's 64-grid points, so compositing statistics
     are unchanged (alpha is distance-free, BaseRender.py:90-91, and thus
     sensitive to sample placement). The (ray, K) frame replaces round 1's
     global nonzero over ray_cap*64 = 4.2M candidates (4x smaller
     compaction + 4x smaller scatter frames);
  6. survivors are globally compacted to `sigma_cap` in slot-major order
     (overflow drops the deepest, mostly-occluded slot across all rays
     uniformly); density for survivors (:294-308); alpha-cull
     (alpha > 1e-14, :316-326) — compacted to `rgb_cap` — color head on the
     survivors;
  7. scatter back into the (ray, K) frame and composite (:334-353).

The reference's dynamic boolean indexing becomes static-shape compaction
with overflow counters; everything runs in two jitted programs (encoder +
progressive) with static shapes.
"""

from __future__ import annotations

import time
from typing import Any, Dict

import jax
import jax.numpy as jnp

from gpnerf_tpu.models.heads import fused_mean_variance
from gpnerf_tpu.models.sparse_net import occupancy_volume
from gpnerf_tpu.ops.projection import project_and_gather_quad
from gpnerf_tpu.ops.rays import pixel_rays, ray_aabb_near_far
from gpnerf_tpu.registry import register
from gpnerf_tpu.render.base import Renderer as BaseRenderer


def pred_img_hwc(ret):
    """Host-side (H, W, 3) predicted image from a demo render dict. The
    device program scatters per-channel (H, W) planes (`pred_chw`) — a
    channel-last (H*W, 3) device scatter pads the 3-lane minor axis to 128
    on TPU — and channel-last assembly happens here with a numpy
    transpose."""
    import numpy as np

    if "pred_img" in ret:
        return np.asarray(ret["pred_img"])
    return np.ascontiguousarray(
        np.moveaxis(np.asarray(ret["pred_chw"]), 0, -1)
    )


def _compact(mask_flat, cap):
    """Static-size index compaction. Returns (idx (cap,), ok (cap,),
    overflow).

    cumsum + scatter instead of jnp.nonzero(size=cap): XLA lowers
    sized nonzero through a full sort of (mask, iota) pairs — ~2.3 ms for
    the 512^2 pixel mask on v5e — while the exclusive-prefix scatter is a
    couple of cheap passes. Same output: indices in ascending order,
    n-filled tail."""
    n = mask_flat.shape[0]
    m = mask_flat.astype(jnp.int32)
    pos = jnp.cumsum(m) - m  # exclusive prefix
    total = pos[-1] + m[-1]
    tgt = jnp.where(mask_flat & (pos < cap), pos, cap)
    idx = (
        jnp.full((cap,), n, jnp.int32)
        .at[tgt]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )
    ok = jnp.arange(cap, dtype=jnp.int32) < total
    overflow = jnp.maximum(total - cap, 0)
    return idx, ok, overflow


def _occ_tap_u32(occb, flat_idx):
    """Nearest-neighbor occupancy tap through u32 WORD gathers: the u8
    volume bitcasts to little-endian 4-byte words once; each tap gathers
    the containing word (flat_idx >> 2) and shifts its byte out. The
    direct u8[flat_idx] form lowers to a 1-D byte gather that measured
    ~8 ns/row at the reference-mode 4.19M taps (trace fusion.16, 34
    ms/frame); the word form rides the 2-3x faster word-row class.
    Returns the tapped byte values (flat_idx shape, uint32 0..255)."""
    flat = occb.reshape(-1)
    npad = (-flat.shape[0]) % 4
    if npad:
        flat = jnp.pad(flat, (0, npad))
    words = jax.lax.bitcast_convert_type(
        flat.reshape(-1, 4), jnp.uint32
    )  # (N/4,)
    w = words[flat_idx >> 2]
    shift = (flat_idx.astype(jnp.uint32) & 3) * 8
    return (w >> shift) & jnp.uint32(0xFF)


class Renderer(BaseRenderer):
    """Adds the progressive full-image path on top of BaseRender."""

    def __init__(self, *args, ray_cap=65536, sigma_cap=1048576, rgb_cap=262144,
                 occupancy_threshold=0.1, compute_dtype=None, tight_cull=False,
                 samples_per_ray=24, quantize_volume=False, tap_window=0,
                 merge_coarse_octet=False, fold_coarse_fc=False,
                 int4_coarse=False, coarse_nearest=0, l1_nearest=False,
                 dense_conv=False,
                 merge_src_feat=False, merge_lowres_src=False,
                 frame_mode=False, dense_slots=False,
                 window_margin_voxels=6.0, splat_bins=False,
                 bin_margin_voxels=2.0, quantize_proj=False,
                 pack_octet_u32=False, proj_vp_order=False,
                 pallas_lerp=False, pallas_point=False, splat_cap=0,
                 kernel_octet=True, sigma_query_cull=False, int4_feat=False,
                 **kwargs):
        super().__init__(*args, **kwargs)
        self.ray_cap = int(ray_cap)
        self.sigma_cap = int(sigma_cap)
        self.rgb_cap = int(rgb_cap)
        # blanket-mode splat compaction cap (0 = dense walk): the
        # sum-over-levels occupied set is compacted to this many rows
        # before the pixel/bin splats; drops surface as ray_overflow
        self.splat_cap = int(splat_cap)
        # lerp the multi-scale geometry rows INSIDE the point megakernel
        # (raw octet/nearest rows + corner weights in, the (P, 8, C)
        # dequant expansion stays in VMEM); falls back to the XLA query
        # for layouts the kernel does not lerp
        self.kernel_octet = bool(kernel_octet)
        # ALSO apply the reference's exact trilinear sp_feats > 0 cull
        # (demo_render.py:274-283) at the density stage in the compacted
        # (non-frame) modes — the voxel-granular occupancy tap admits
        # fringe samples whose trilinear level-1 support is <= 0. Off by
        # default (the alpha cull makes it fps-neutral quality-wise); the
        # demo-vs-Base consistency test turns it on together with
        # tpu.base_occupancy_cull so both pipelines run the identical cull.
        self.sigma_query_cull = bool(sigma_query_cull)
        # int4 split-pack the SPLIT-mode encoder-feature table (in-kernel
        # nibble unpack; requires quantize_proj + pallas_point). The
        # kernel path alone consumes it — the op-by-op/XLA fallback has
        # no int4 sampler, so only the fused TPU path may enable this.
        self.int4_feat = bool(int4_feat)
        # tap_window W (0 = off): occupancy-tap only W consecutive samples of
        # the reference 64-grid starting at each ray's splat-derived front
        # depth (per-pixel scatter-min of occupied-voxel camera depth) minus
        # a 3-voxel margin, instead of tapping all 64 candidates. Sample
        # POSITIONS stay on the reference grid; only candidates more than W
        # samples behind the front surface are never tapped (they are
        # occluded: transmittance collapses at the front shell, which is why
        # the per-ray K-slot keep-nearest policy works at all). Cuts the
        # dominant per-frame gather count (ray_cap*64 byte-taps) by 64/W.
        self.tap_window = int(tap_window)
        self.occupancy_threshold = float(occupancy_threshold)
        self.compute_dtype = compute_dtype  # bf16 halves gather/MXU bytes
        # tight_cull: cull samples against the level-1-only occupancy (body
        # surface +-1 voxel) instead of the reference's sum-over-levels field
        # whose coarse levels blanket ~8 cm around the body. Points outside
        # the tight field have near-zero trained density, so this trades a
        # negligible metric delta for ~5x fewer density evaluations.
        self.tight_cull = bool(tight_cull)
        # K: per-ray cap on surviving (occupancy-positive) samples of the
        # reference's 64-sample grid. Trained bodies average ~8 survivors
        # per ray (entry/exit shells of the hollow SMPL surface).
        self.samples_per_ray = int(samples_per_ray)
        # uint8-quantize the octet feature tables (per-channel scales): the
        # level-1 table is the pipeline's dominant random-gather target and
        # the features are post-ReLU activations
        self.quantize_volume = bool(quantize_volume)
        self.merge_coarse_octet = bool(merge_coarse_octet)
        # fold out_geometry_fc's coarse block into the merged coarse table:
        # trilerp(W2 @ v) == W2 @ trilerp(v), so the per-frame dense matmul
        # shrinks coarse octet rows 96 -> 64 ch (25% of the dominant gather
        # bytes); the per-point linear keeps only its level-1 block
        # (pack_octet_u32's post-gather unpack assumes unsigned bytes, so
        # the signed folded table is incompatible with it)
        self.fold_coarse_fc = (
            bool(fold_coarse_fc)
            and self.merge_coarse_octet
            and not bool(pack_octet_u32)
        )
        # int4 split-pack of the folded coarse table (halves its gather
        # row bytes again); needs the signed folded field + quantization
        self.int4_coarse = (
            bool(int4_coarse) and self.fold_coarse_fc and bool(quantize_volume)
        )
        # nearest-neighbor coarse sampling (64 B/point vs the 512 B octet
        # row): 0 = off, 1 = nearest at the native level-2 grid, 2 =
        # nearest at the level-1 grid (field upsampled once per frame);
        # folded+quantized only, quality-gated by the full-set sweep
        self.coarse_nearest = (
            int(coarse_nearest)
            if (
                self.fold_coarse_fc
                and bool(quantize_volume)
                and not self.int4_coarse
            )
            else 0
        )
        # nearest-sampled level-1 table (32 B/point flat rows): 0 = off,
        # 1 = at its native level-1 grid, 2 = at the level-0 grid (field
        # upsampled once per frame); quantized sparse-build path only,
        # quality-gated by the full-set sweep
        self.l1_nearest = (
            int(l1_nearest) if bool(quantize_volume) else 0
        )
        self.dense_conv = bool(dense_conv)
        self.merge_src_feat = bool(merge_src_feat)
        self.merge_lowres_src = bool(merge_lowres_src)
        # frame_mode: evaluate the K consecutive front-anchored samples of
        # EVERY ray directly as the (K, R) frame — no occupancy tap, no
        # rank/global compaction, no composite scatters; the reference's
        # tight occupancy cull is applied as a zero-density mask read off
        # the multi-scale query itself. Requires the zmin window
        # (tap_window > 0) and a non-neg_ray dataset; falls back to the
        # compacted pipeline otherwise.
        self.frame_mode = bool(frame_mode)
        # dense_slots: evaluate ALL K*R compacted slots as the dense
        # slot-major (K, R) frame instead of globally compacting them to
        # sigma_cap — the SAME surviving points (per-ray rank compaction is
        # unchanged), plus masked (zero-weight) rows for rays with < K
        # survivors. Trades ~17% more rows through the point stages
        # (K*ray_cap vs sigma_cap) for dropping the whole global-compaction
        # chain: the sig_cap nonzero, the packed point-recompute gather,
        # and the sigma/rgb scatter-backs into (K, R) composite planes.
        # Quality-identical to the compacted path whenever that path has
        # zero sigma-cap drops (the shipped regime).
        self.dense_slots = bool(dense_slots)
        # front-margin of the zmin window, in level-0 voxels (6 = 3 level-1
        # voxels): guards splat-granularity overshoot of the front depth
        self.window_margin_voxels = float(window_margin_voxels)
        # splat-bin cull: occupied voxels scatter per-pixel DEPTH-BIN masks
        # during the splat; the per-sample occupancy tap (ray_cap * W
        # random byte gathers) becomes one (S,)-row gather per ray.
        # tight_cull only; works for BOTH ray conventions (bins live on the
        # signed t-parameter grid). bin_margin_voxels = half-extent of a
        # voxel's bin coverage in level-0 voxel units.
        self.splat_bins = bool(splat_bins)
        self.bin_margin_voxels = float(bin_margin_voxels)
        # int8-quantize the merged [rgb|feat] projection table (per-channel
        # symmetric scales, dequant after the bilinear sum): halves the
        # bytes of the largest per-point gather and of its downstream
        # (P, V, C) relayout
        self.quantize_proj = bool(quantize_proj)
        # build/store the u8 octet tables as packed uint32 words: quarters
        # the element count of the pad+concat table build (same bytes, same
        # gather rows; rows unpack after the gather)
        self.pack_octet_u32 = bool(pack_octet_u32)
        # per-view (V, P) projection gather + float-output transpose instead
        # of the (P, V)-ordered gather (layout-assignment trade; see
        # ops/projection.py)
        self.proj_vp_order = bool(proj_vp_order)
        # fused Pallas projection weighted-sum (TPU backend only; the JAX
        # path is used elsewhere and under tests)
        self.pallas_lerp = bool(pallas_lerp)
        # fused point-stage megakernel (quad-lerp + mean/var + all MLP
        # heads + masks in ONE Pallas kernel; ops/pallas_point.py).
        # Supersedes pallas_lerp on the demo path when set.
        self.pallas_point = bool(pallas_point)
        self._demo_jit = None
        self._encoder_jit = None
        self._last_etime = 0.0

    # ------------------------------------------------------------------
    def encode_fn(self):
        """Encoder as its own jit (the reference times it separately as
        `etime`, demo_render.py:442-445,494-497)."""
        if self._encoder_jit is None:
            from gpnerf_tpu.render.base import src_norm

            self._encoder_jit = jax.jit(
                lambda variables, imgs: self.encoder.apply(
                    variables["encoder"], src_norm(imgs)
                )
            )
        return self._encoder_jit

    # ------------------------------------------------------------------
    _ZFAR = 1e9  # sentinel for pixels no occupied voxel splats onto

    def _splat_pixels(self, pts_w, row_ok, batch, Himg, Wimg):
        """Project world points into the target view and mark each one's 4
        neighboring pixels (demo_render.py:179-199). Also scatter-mins each
        point's camera depth per pixel (the front-surface depth the windowed
        occupancy tap starts from; camera depth == the ray's near/far
        t-parameter because pixel_rays directions have unit camera z).
        Returns (pixmask (Himg*Wimg,) int32, zmin (Himg*Wimg,) float32)."""
        tp = batch["target_pose"]  # (3, 4)
        tK = batch["target_K"]
        cam = pts_w @ tp[:, :3].T + tp[:, 3]
        pix = cam @ tK.T
        # sign-preserving depth guard: neg_ray targets (THuman) put scene
        # points at NEGATIVE camera z and compensate in K — clamping to
        # +1e-9 would blow up every projection there
        z = pix[:, 2:3]
        z = jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)
        xy = pix[:, :2] / z
        minx = jnp.clip(jnp.floor(xy[:, 0]).astype(jnp.int32), 0, Wimg - 1)
        miny = jnp.clip(jnp.floor(xy[:, 1]).astype(jnp.int32), 0, Himg - 1)
        maxx = jnp.clip(minx + 1, 0, Wimg - 1)
        maxy = jnp.clip(miny + 1, 0, Himg - 1)
        pixmask = jnp.zeros((Himg * Wimg,), jnp.int32)
        zmin = jnp.full((Himg * Wimg,), self._ZFAR, jnp.float32)
        depth = jnp.where(row_ok, cam[:, 2], self._ZFAR).astype(jnp.float32)
        oob = Himg * Wimg
        for yy, xx in ((miny, minx), (maxy, minx), (miny, maxx), (maxy, maxx)):
            tgt = jnp.where(row_ok, yy * Wimg + xx, oob)
            pixmask = pixmask.at[tgt].set(1, mode="drop")
            zmin = zmin.at[tgt].min(depth, mode="drop")
        return pixmask, zmin, (minx, miny, maxx, maxy)

    def _splat_bins(self, pts_w, row_ok, batch, Himg, Wimg, can_bounds,
                    minx, miny, maxx, maxy):
        """Scatter each occupied voxel's DEPTH-BIN occupancy into its 4
        splat pixels: binimg[pix, s] = 1 iff some occupied voxel covers
        sample s of pixel pix's reference 64-grid. Replaces the per-sample
        occupancy tap (ray_cap * W random byte-gathers) with one
        (S,)-row gather per ray. Bin indices use the SAME per-pixel
        near/far (ray/AABB slab, camera-z parameterization) as the ray
        stage, so a marked bin is exactly a 64-grid sample inside the
        voxel's depth extent (+- bin_margin). Returns (Himg*Wimg, S) u8
        rows, dilated over the pixel quad + 1 px (the same dilation the
        pixmask gets: splat granularity can exceed 1 px at close range);
        per-ray rows gather directly."""
        S = self.n_samples
        tp = batch["target_pose"]
        depth = pts_w @ tp[2, :3] + tp[2, 3]  # camera z == ray t-parameter
        # SEPARABLE form: ONE scatter at (floor pixel, span-start bin), then
        # shift-OR dilation fills the depth span and the pixel quad (the old
        # 4-pixel x 6-step j-loop paid ~0.4 ms per scatter pass on the
        # 16.7 MB u8 buffer — sub-word RMW — for 24 passes' worth of
        # indices; the dilation passes below are dense vector ORs).
        xy1 = jnp.stack(
            [minx, miny, jnp.ones_like(minx)], axis=-1
        ).astype(jnp.float32)
        ro, rd = pixel_rays(
            xy1, batch["target_K_inv"], tp[:, :3], tp[:, 3:]
        )
        near, far, mask_box = ray_aabb_near_far(ro, rd, can_bounds)
        dz = jnp.maximum((far - near) / (S - 1), 1e-9)
        rad = self.bin_margin_voxels * jnp.float32(self.voxel_size[0])
        b0 = jnp.floor((depth - rad - near) / dz).astype(jnp.int32)
        ok = row_ok & mask_box & (b0 < S)
        pix = miny * Wimg + minx
        # u8 bin image (i32 measured SLOWER here: 4x the buffer outweighs
        # word-aligned scatter writes)
        binimg = jnp.zeros((Himg * Wimg * S,), jnp.uint8)
        oob = Himg * Wimg * S
        tgt = jnp.where(ok, pix * S + jnp.clip(b0, 0, S - 1), oob)
        binimg = binimg.at[tgt].set(1, mode="drop")
        bi = binimg.reshape(Himg, Wimg, S)
        # UNPACKED u8 dilation. (A bit-packed u32 form — pack the bin axis,
        # shift with cross-word carries, unpack after the per-ray gather —
        # ran the OR passes on 1/8 the bytes and won under the round-3
        # compiler; the current XLA materializes its byte-pack
        # multiply-reduce + bitcast as ~9 ms of lane-padded copies, while
        # these whole-image u8 ORs are ~0.1 ms/pass. See git history.)
        # depth fill: marks at b0+j, j=1..5 — the same static span the old
        # per-index j-loop covered (2*rad + rounding at any dz)
        acc = bi
        for j in (1, 2, 3, 4, 5):
            acc = acc | jnp.pad(bi, ((0, 0), (0, 0), (j, 0)))[:, :, :S]
        # pixel plane: [-1, +2] in x and y covers the splat quad plus the
        # one-pixel dilation (superset of the old quad + 4-neighborhood;
        # looser is conservative — the cull keeps a few more samples).
        # Neighbors inherit the center pixel's bin indices; per-pixel
        # near/far differ by < 1 bin and rad's +-2-bin margin absorbs it.
        ax = acc
        for j in (-1, 1, 2):
            ax = ax | jnp.roll(acc, j, axis=1)
        ay = ax
        for j in (-1, 1, 2):
            ay = ay | jnp.roll(ax, j, axis=0)
        return ay.reshape(Himg * Wimg, S)

    def _ray_pipeline(self, head_vars, batch, pre, tables, rays_o, rays_d,
                      near, far, ray_ok, zmin=None, bins=None,
                      stop_stage=None):
        """Stages (5)-(8) — occupancy cull, per-ray K-slot compaction,
        projection gather, density, color, composite — over a (possibly
        device-sharded) slice of rays. Point capacities scale with the
        slice so a mesh of N chips splits the per-point work N ways
        (parallel/dp.make_dp_demo_render).

        All per-candidate tensors run TRANSPOSED (window/slot axis leading,
        rays on the 128-lane axis): (R, W)-shaped buffers with W < 128 pad
        the lane dimension 4-8x on TPU; (W, R) layouts keep the cumsum /
        rank-compare / transmittance chains dense."""
        apply = lambda method, *a, **kw: self.nerfhead.apply(
            head_vars, *a, **kw, method=method
        )
        tables = dict(tables, head_vars=head_vars)  # for the fused kernel's
        # trace-time weight packing (pallas_point)
        anchor = tables.get("anchor", 0.0)  # profiling DCE guard (frame stage)
        neg_ray = self.neg_ray_val
        S = self.n_samples
        K = self.samples_per_ray
        nr = rays_o.shape[0]
        sig_cap = max(1, self.sigma_cap * nr // self.ray_cap)
        occb = tables["occb"]
        octet_vols = tables["octet_vols"]
        octet_scales = tables["octet_scales"]
        src_quad = tables["src_quad"]
        feat_quad = tables["feat_quad"]
        out_sh = pre["out_sh"]

        # windowed tap start: W consecutive grid samples from the splat
        # front depth minus a 3-level-1-voxel margin (neg_ray flips the
        # depth sign; the window is disabled there and W falls back to S).
        # With splat bins the occupancy signal arrives AS (R, S) per-ray
        # bin rows — no window, no tap.
        use_window = (
            bins is None
            and 0 < self.tap_window < S
            and not neg_ray
            and zmin is not None
        )
        W = max(self.tap_window, K) if use_window else S
        if use_window:
            dz = jnp.maximum((far - near) / (S - 1), 1e-9)
            margin = self.window_margin_voxels * jnp.float32(
                self.voxel_size[0]
            )
            s_lo = jnp.floor((zmin - margin - near) / dz).astype(jnp.int32)
            s_lo = jnp.where(zmin > 1e8, 0, jnp.clip(s_lo, 0, S - W))
        else:
            s_lo = jnp.zeros((nr,), jnp.int32)
        s_lo_f = s_lo.astype(jnp.float32)
        # TRAVERSAL order: slot/window index w maps to absolute sample
        # s = s0 + sgn*w such that w ascending is FRONT-TO-BACK along the
        # ray. Normal rays: ascending t = front-to-back (sgn +1). neg_ray
        # (THuman, t < 0): ascending t runs BACK-to-front — the reference
        # flips the sample order in raw2outputs (BaseRender.py:86-88) — so
        # traversal descends the sample grid (sgn -1 from the window's far
        # end). The per-ray keep-first-K policy then drops the FARTHEST
        # (occluded) samples in both conventions, and the (K, R) composite's
        # shifted cumprod always runs front-to-back.
        sgn = -1.0 if neg_ray else 1.0
        s0_f = (s_lo_f + (W - 1)) if neg_ray else s_lo_f

        # frame mode also covers the WINDOWLESS blanket program (reference
        # semantics: tight_cull off, K == S == 64) — the frame is then the
        # full sample grid (s_lo = 0) and the occupancy cull comes from the
        # query / in-kernel level-1 lerp instead of the tap, which skips
        # the tap gather + rank compaction entirely (trace r5: 26 ms tap +
        # ~12 ms slot machinery on the 3.67M-point blanket frame)
        frame_mode = self.frame_mode and (
            use_window or (bins is None and not neg_ray and K == S)
        )
        if frame_mode:
            # FRAME MODE: no occupancy tap, no rank compaction, no global
            # compaction. The per-point frame is the K consecutive 64-grid
            # samples from each ray's splat front depth, laid out slot-major
            # (K, R); the reference's occupancy cull (`sp_feats > 0`,
            # demo_render.py:274-283, tight level-1 field) is applied as a
            # zero-density mask computed FOR FREE from the multi-scale
            # octet query (trilinear is linear, so the level-1 channel sum
            # of the queried features IS the trilinear occupancy), and the
            # composite reads the (K, R) frame directly with no scatters.
            P = nr * K
            kT = jnp.arange(K, dtype=jnp.float32)[:, None]  # (K, 1)
            tT = (s_lo_f[None, :] + kT) / jnp.float32(S - 1)  # (K, R)
            zT = near[None, :] * (1.0 - tT) + far[None, :] * tT
            comps = [
                rays_o[None, :, i] + rays_d[None, :, i] * zT for i in range(3)
            ]
            pts_c = jnp.stack(comps, axis=-1).reshape(P, 3)
            dhw_c = self.points_to_dhw_vox(pts_c, batch)
            sig_ok = jnp.broadcast_to(ray_ok[None, :], (K, nr)).reshape(P)
            perray_overflow = jnp.int32(0)  # nothing measured is dropped
            sig_overflow = jnp.int32(0)
            sig_idx_t = None
            if stop_stage in ("cull_occ", "cull_slots", "cull_compact"):
                return ({"dbg": pts_c.sum() + dhw_c.sum() + anchor}, None)
            return self._point_stages(
                apply, batch, pre, tables, pts_c, dhw_c, sig_ok, sig_idx_t,
                perray_overflow, sig_overflow, K, nr, ray_ok, neg_ray,
                frame_mode=True, stop_stage=stop_stage,
            )

        # (5) occupancy cull (:270-283). The reference keeps points whose
        # trilinear occupancy sample is > 0, i.e. any corner of the point's
        # cell is occupied.
        if bins is not None:
            # splat-bin form: the (R, S) per-ray bin rows gathered in the
            # frame stage ARE the cull — a sample survives iff an occupied
            # voxel splat-covers (pixel +-1, depth bin +- margin). W == S;
            # no per-sample gathers, no in-volume test (a marked bin
            # implies a real voxel).
            okS = bins.T > 0  # (S, R), ascending sample index
            if neg_ray:
                okS = okS[::-1]  # traversal order: front-to-back
            ok = okS & ray_ok[None, :]  # (W=S, R)
        else:
            # Equivalent-or-looser single-tap form: one-voxel dilation of
            # the binary occupancy, nearest-neighbor lookup — 1 byte-sized
            # gather per point instead of 8 float taps (the cull is
            # conservative: keeping a superset only adds a few points
            # downstream). Candidate positions are computed per-ray
            # affinely as (W, R) component planes — no (R*S, 3) point
            # buffers, no trailing length-3 axes.
            tT = (
                s0_f[None, :]
                + sgn * jnp.arange(W, dtype=jnp.float32)[:, None]
            ) / jnp.float32(S - 1)  # (W, R) grid parameter s/(S-1)
            zT = near[None, :] * (1.0 - tT) + far[None, :] * tT  # (W, R)
            Rh = batch["Rh"]
            Th = batch["Th"].reshape(3)
            min_xyz = batch["bounds"][0]
            vs_xyz = jnp.asarray(self.voxel_size, jnp.float32)
            size1 = out_sh // 2
            D1c, H1c, W1c = occb.shape
            scale1 = (size1 - 1).astype(jnp.float32) / out_sh.astype(
                jnp.float32
            )
            cap1 = jnp.asarray([D1c - 1, H1c - 1, W1c - 1])
            cellT = []
            inbT = jnp.full((W, nr), True)
            for j in (2, 1, 0):  # dhw component j = canonical axis (2-j)
                # world -> canonical -> level-0 voxel units -> level-1
                # cell, all as (W, R) planes (points_to_dhw_vox
                # componentwise)
                can_j = sum(
                    (rays_o[None, :, i] + rays_d[None, :, i] * zT - Th[i])
                    * Rh[i, 2 - j]
                    for i in range(3)
                )
                pos1_j = (can_j - min_xyz[2 - j]) / vs_xyz[2 - j] * scale1[j]
                cell_j = jnp.round(pos1_j).astype(jnp.int32)
                inbT = inbT & (cell_j >= 0) & (cell_j < size1[j])
                cellT.append(jnp.clip(cell_j, 0, cap1[j]))
            flat_idxT = (cellT[2] * H1c + cellT[1]) * W1c + cellT[0]
            # word-gather tap: the direct 1-byte gather lowers to an
            # ~8 ns/row 1-D gather on this runtime (trace_demo fusion.16,
            # 34 ms at the ref-mode 4.19M taps); gathering the containing
            # little-endian u32 word and shifting the byte out rides the
            # faster word-gather class. Semantics parity-tested against
            # the byte tap (tests/test_demo_consistency.py).
            ok = (
                (_occ_tap_u32(occb, flat_idxT) > 0)
                & inbT
                & ray_ok[None, :]
            )  # (W, R)
        if stop_stage == "cull_occ":
            return ({"dbg": ok.sum() + anchor}, None)

        # per-ray rank compaction: slot k of a ray holds the WINDOW sample
        # index of its (k+1)-th occupied sample (sentinel W when fewer).
        # Keeping the NEAREST K survivors drops the farthest — occluded
        # behind the front surface (transmittance ~0) — samples first.
        cum = jnp.cumsum(ok.astype(jnp.int32), axis=0)  # (W, R)
        slot_relT = (
            cum[None, :, :]
            <= jnp.arange(K, dtype=jnp.int32)[:, None, None]
        ).sum(axis=1, dtype=jnp.int32)  # (K, R); == W when <= k survivors
        slot_validT = slot_relT < W
        perray_overflow = jnp.maximum(cum[-1] - K, 0).sum()
        if stop_stage == "cull_slots":
            return ({"dbg": slot_relT.sum() + perray_overflow + anchor}, None)

        if self.dense_slots:
            # evaluate the whole (K, R) slot frame in identity layout: no
            # global compaction, no point-recompute gather, no composite
            # scatters. Masked slots clamp to the last window sample and
            # zero out through sig_ok.
            P = nr * K
            s_absT = s0_f[None, :] + sgn * jnp.minimum(
                slot_relT, W - 1
            ).astype(jnp.float32)  # (K, R)
            tT = s_absT / jnp.float32(S - 1)
            zT = near[None, :] * (1.0 - tT) + far[None, :] * tT
            comps = [
                rays_o[None, :, i] + rays_d[None, :, i] * zT for i in range(3)
            ]
            pts_c = jnp.stack(comps, axis=-1).reshape(P, 3)
            sig_ok = slot_validT.reshape(P)
            # (measured: pinning invalid slots' points to one constant row
            # does NOT speed the downstream gathers on this runtime — no
            # repeated-row/locality effect, same result as the round-2
            # cell-sort experiment — so masked slots just keep their
            # clamped sample position)
            dhw_c = self.points_to_dhw_vox(pts_c, batch)
            if stop_stage == "cull_compact":
                return ({"dbg": pts_c.sum() + dhw_c.sum() + anchor}, None)
            return self._point_stages(
                apply, batch, pre, tables, pts_c, dhw_c, sig_ok, None,
                perray_overflow, jnp.int32(0), K, nr, ray_ok, neg_ray,
                # the tap already culled; tpu.sigma_query_cull opts into
                # the trilinear sp_feats>0 cull ON TOP (same as the
                # compact path) — that makes dense_slots and windowless
                # frame mode cull the identical sample set (parity test)
                frame_mode=True, mask_from_query=self.sigma_query_cull,
                n_sigma=slot_validT.sum(), stop_stage=stop_stage,
            )

        # global compaction to sigma_cap, SLOT-major: overflow drops the
        # deepest slot uniformly across rays (graceful degradation) instead
        # of whole image regions
        sig_idx_t, sig_ok, sig_overflow = _compact(
            slot_validT.reshape(-1), sig_cap
        )
        P = nr * K
        idx_c = jnp.minimum(sig_idx_t, P - 1)

        # recompute compacted points with ONE packed-row gather per point:
        # a (K, R, 9) table [o, d, near, far, s_abs] — per-ray columns
        # broadcast over slots, the slot-dependent absolute sample index
        # folded in on the dense (K, R) frame (a ~12 MB sequential write
        # replaces the previous ray-row + slot-row gather pair)
        s_absT = s0_f[None, :] + sgn * jnp.minimum(slot_relT, W - 1).astype(
            jnp.float32
        )  # (K, R)
        ray_tab = jnp.concatenate(
            [rays_o, rays_d, near[:, None], far[:, None]], axis=1
        )  # (R, 8) float32
        packed = jnp.concatenate(
            [jnp.broadcast_to(ray_tab[None], (K, nr, 8)), s_absT[:, :, None]],
            axis=-1,
        ).reshape(P, 9)
        rows9 = packed[idx_c]  # (sig_cap, 9)
        t_of = rows9[:, 8] / (S - 1)
        z_of = rows9[:, 6] * (1.0 - t_of) + rows9[:, 7] * t_of
        pts_c = rows9[:, 0:3] + rows9[:, 3:6] * z_of[:, None]
        dhw_c = self.points_to_dhw_vox(pts_c, batch)
        if stop_stage == "cull_compact":
            return ({"dbg": pts_c.sum() + dhw_c.sum() + anchor}, None)
        return self._point_stages(
            apply, batch, pre, tables, pts_c, dhw_c, sig_ok, sig_idx_t,
            perray_overflow, sig_overflow, K, nr, ray_ok, neg_ray,
            frame_mode=False, n_sigma=slot_validT.sum(),
            stop_stage=stop_stage,
        )

    def _point_stages_fused(self, apply, batch, pre, tables, pts_c, dhw_c,
                            sig_ok, sig_idx_t, perray_overflow, sig_overflow,
                            K, nr, ray_ok, neg_ray, *, frame_mode,
                            mask_from_query=None, n_sigma=None):
        """Megakernel form of _point_stages (ops/pallas_point.py): the
        octet query + projection gathers stay XLA (its gather engine wins);
        ONE Pallas kernel runs quad-lerp + mean/var + sigma-feat linear +
        density MLP + color MLP + masks and emits only the (alpha, rgb)
        pair the composite needs. Runs with the merged [rgb|feat] table
        (production) or with separate full-res rgb + feature-grid tables
        (reference-semantics mode, demo_render.py:586,594): each table's
        raw quad rows and tap weights feed the kernel, which lerps and
        concatenates the channel blocks."""
        from gpnerf_tpu.ops.pallas_point import (
            fused_point_stages_tabs,
            pack_head_weights,
        )
        from gpnerf_tpu.ops.projection import project_gather_rows_merged

        octet_vols = tables["octet_vols"]
        octet_scales = tables["octet_scales"]
        src_quad = tables["src_quad"]
        out_sh = pre["out_sh"]
        P = nr * K
        head_vars = tables["head_vars"]

        # multi-scale geometry: raw quantized rows + corner weights feed the
        # kernel's in-VMEM trilerp (geom tabs) when every level's table maps
        # (octet-row or plain-nearest layouts; query_octet2 order/sizing,
        # models/sparse_net.py:172-204) — the XLA query's (P, 8, C) dequant
        # expansion never touches HBM. Falls back to the XLA-side query for
        # layouts the kernel does not lerp (lerp-axes nearest rungs, int4,
        # u32-packed) and when the occupancy gate needs the queried features
        # (mask_from_query).
        if mask_from_query is None:
            mask_from_query = frame_mode or self.sigma_query_cull
        from gpnerf_tpu.ops.grid_sample import (
            FlatOctetTable,
            NearestTable,
            nearest_row_and_weight,
            octet_rows_and_weights,
        )

        def _geom_tab(i, tab):
            sc = None if octet_scales is None else octet_scales[i]
            frac = dhw_c / out_sh.astype(dhw_c.dtype)
            if isinstance(tab, NearestTable):
                if tab.lerp_axes != 0:
                    return None
                size = out_sh // tab.div
                if tab.interleave > 1:
                    size = tab.interleave * (size - 1) + 1
                pos = frac * (size - 1).astype(dhw_c.dtype)
                grows, gw = nearest_row_and_weight(tab, pos, size)
            elif (
                isinstance(tab, FlatOctetTable)
                and tab.rows.dtype != jnp.uint32
            ) or (
                hasattr(tab, "dtype") and tab.dtype != jnp.uint32
            ):
                size = out_sh // (2 ** (i + 1))
                pos = frac * (size - 1).astype(dhw_c.dtype)
                grows, gw = octet_rows_and_weights(tab, pos, size)
            else:
                return None  # int4 / u32-packed / lerp-axes layouts
            if sc is None:
                Tg = gw.shape[-1]
                sc = jnp.ones((grows.shape[-1] // Tg,), jnp.float32)
            return grows, gw.T, sc

        geom_tabs = None
        if self.kernel_octet:
            geom_tabs = [_geom_tab(i, t) for i, t in enumerate(octet_vols)]
            if any(g is None for g in geom_tabs):
                geom_tabs = None
        occ_kernel = False
        nch = self.nerfhead.spconv_out_dim[0]
        if geom_tabs is not None and mask_from_query:
            # the occupancy gate no longer forces the XLA query: the kernel
            # derives the reference's `sp_feats > 0` cull
            # (demo_render.py:294) from geom tab 0's lerped level-1 block —
            # provided tab 0 IS the nch-channel level-1 table
            if geom_tabs[0][0].shape[-1] // geom_tabs[0][1].shape[0] == nch:
                occ_kernel = True
            else:
                geom_tabs = None
        feats = None
        if geom_tabs is None:
            kw = {} if octet_scales is None else {"scales": octet_scales}
            if len(octet_vols) == 2:
                feats = apply(
                    lambda m, *a, **k:
                        m.sigmahead.xyzc_net.query_octet2(*a, **k),
                    octet_vols[0], octet_vols[1], dhw_c, out_sh, **kw,
                )
            else:
                feats = apply(
                    lambda m, *a, **k:
                        m.sigmahead.xyzc_net.query_octet(*a, **k),
                    octet_vols, dhw_c, out_sh, **kw,
                )  # (P, 128)
        if mask_from_query and not occ_kernel:
            occ_l1 = feats[..., :nch].sum(axis=-1)
            sig_ok = sig_ok & (occ_l1.astype(jnp.float32) > 0)

        Hsrc, Wsrc = batch["src_imgs"].shape[1:3]
        feat_quad = tables.get("feat_quad")
        if feat_quad is None:
            rows, w4, vmask = project_gather_rows_merged(
                pts_c, pre["KE"], src_quad, Hsrc, Wsrc, neg_ray=neg_ray
            )
            scale = tables.get("proj_scale")
            if scale is None:
                scale = jnp.ones((rows.shape[-1] // 4,), jnp.float32)
            tabs = ((rows, w4, scale),)
            C = rows.shape[-1] // 4
        else:
            # split-table form (reference semantics): raw u8 rgb rows from
            # the full-res source table + raw (int8-quantized) feature
            # rows from the encoder-grid table, BOTH quad-lerped in-kernel
            # (dequant after the weighted sum). An XLA-side feature
            # pre-lerp was measured SLOWER at the ref-mode 4.19M-point
            # frame: the weighted sum + out-of-bounds select cost 35 ms on
            # top of the unavoidable row gather, while the kernel lerp
            # rides the selector contractions it already runs. The view
            # mask is projection-only and identical for both tables.
            # gather forms measured per table (r5 A/B, ms/frame for the
            # whole ref mode): src flat + feat batched 317-347, src
            # batched + feat batched 403, src flat + feat flat 534 — the
            # 9.5 MB full-res src table gathers best flat, the 6.4 MB
            # feature table best V-batched (per-view 2.1 MB slices land
            # in VMEM)
            rows_s, w4_s, vmask = project_gather_rows_merged(
                pts_c, pre["KE"], src_quad, Hsrc, Wsrc, neg_ray=neg_ray
            )
            rows_f, w4_f, _ = project_gather_rows_merged(
                pts_c, pre["KE"], feat_quad, Hsrc, Wsrc, neg_ray=neg_ray,
                batched=True,
            )
            src_scale = tables.get("src_scale")
            if src_scale is None:
                src_scale = jnp.ones((rows_s.shape[-1] // 4,), jnp.float32)
            feat_scale = tables.get("feat_scale")
            # channel count from the scale vector, NOT the row byte width:
            # int4 split-packed rows carry 2 channels/byte
            if feat_scale is None:
                Cf = rows_f.shape[-1] // 4
                feat_scale = jnp.ones((Cf,), jnp.float32)
            else:
                Cf = feat_scale.shape[-1]
            tabs = (
                (rows_s, w4_s, src_scale),
                (rows_f, w4_f, feat_scale),
            )
            C = rows_s.shape[-1] // 4 + Cf
        weights = pack_head_weights(
            head_vars["params"], C,
            fold_nch=(
                self.nerfhead.spconv_out_dim[0]
                if tables.get("folded")
                else None
            ),
        )
        outs = fused_point_stages_tabs(
            tabs, feats, vmask, sig_ok, weights,
            geom_tabs=tuple(geom_tabs) if geom_tabs else (),
            occ_geom=occ_kernel,
        )  # alpha (P,) sigma-masked; rgb (P, 3) alpha-culled
        alpha, rgb = outs[0], outs[1]
        if occ_kernel:
            # fold the kernel's occupancy verdict back into sig_ok so the
            # n_sigma stat counts occupancy-passing samples, same as the
            # XLA-query fallback
            sig_ok = sig_ok & (outs[2] > 0.5)
        alpha_live = alpha > 1e-14  # kernel alpha is 0 wherever culled

        # composite over the slot-major (K, ray) frame — same as the
        # op-by-op path's stage (8)
        if frame_mode:
            alpha_kr = alpha.reshape(K, nr)
            rgb_chan = [rgb[:, c].reshape(K, nr) for c in range(3)]
        else:
            tgt = jnp.where(sig_ok, sig_idx_t, P)
            rgb_tgt = jnp.where(alpha_live, sig_idx_t, P)
            alpha_kr = (
                jnp.zeros((P,)).at[tgt].set(alpha, mode="drop").reshape(K, nr)
            )
            rgb_chan = [
                jnp.zeros((P,)).at[rgb_tgt].set(rgb[:, c], mode="drop")
                .reshape(K, nr)
                for c in range(3)
            ]
        T = jnp.concatenate(
            [
                jnp.ones((1, nr)),
                jnp.cumprod(1.0 - alpha_kr[:-1] + 1e-10, axis=0),
            ],
            axis=0,
        )
        weights_kr = alpha_kr * T
        rgb_map = jnp.stack(
            [(weights_kr * hc).sum(axis=0) for hc in rgb_chan], axis=-1
        )
        rgb_map = jnp.where(ray_ok[:, None], rgb_map, 0.0)
        stats = {
            "perray_overflow": perray_overflow,
            "sig_overflow": sig_overflow,
            "n_sigma": sig_ok.sum() if n_sigma is None else n_sigma,
            "n_rgb": alpha_live.sum(),
        }
        return rgb_map, stats

    def _point_stages(self, apply, batch, pre, tables, pts_c, dhw_c, sig_ok,
                      sig_idx_t, perray_overflow, sig_overflow, K, nr,
                      ray_ok, neg_ray, *, frame_mode, mask_from_query=None,
                      n_sigma=None, stop_stage=None):
        """Stages (6)-(8): projection gather, density, color, composite —
        over either the compacted point list (sig_idx_t slot-major indices)
        or the full (K, R) frame (frame_mode: identity layout, no
        scatters)."""
        octet_vols = tables["octet_vols"]
        octet_scales = tables["octet_scales"]
        src_quad = tables["src_quad"]
        feat_quad = tables["feat_quad"]
        out_sh = pre["out_sh"]
        P = nr * K

        # fused point-stage megakernel (ops/pallas_point.py): projection
        # quad-lerp + mean/var + sigma-feat linear + density MLP + color MLP
        # + masks in ONE Pallas kernel; only the gathers and the composite
        # remain XLA ops. Works with the merged projection table or the
        # split (full-res rgb + feature-grid) pair; profiling prefixes fall
        # back to the op-by-op path.
        use_fused = (
            self.pallas_point
            and jax.default_backend() == "tpu"
            and stop_stage is None
        )
        if use_fused:
            return self._point_stages_fused(
                apply, batch, pre, tables, pts_c, dhw_c, sig_ok, sig_idx_t,
                perray_overflow, sig_overflow, K, nr, ray_ok, neg_ray,
                frame_mode=frame_mode, mask_from_query=mask_from_query,
                n_sigma=n_sigma,
            )

        # project + gather only for survivors (demo projector.compute :284)
        Hsrc, Wsrc = batch["src_imgs"].shape[1:3]
        if feat_quad is None:
            from gpnerf_tpu.ops.projection import project_and_gather_quad_merged

            rgb_feat, view_mask = project_and_gather_quad_merged(
                pts_c, pre["KE"], src_quad, Hsrc, Wsrc, neg_ray=neg_ray,
                scale=tables.get("proj_scale"), vp_order=self.proj_vp_order,
                pallas=self.pallas_lerp and jax.default_backend() == "tpu",
                out_dtype=(
                    self.compute_dtype
                    if tables.get("proj_scale") is not None
                    else None
                ),
            )
        else:
            rgb_feat, view_mask = project_and_gather_quad(
                pts_c, pre["KE"], src_quad, feat_quad, Hsrc, Wsrc,
                neg_ray=neg_ray, src_scale=tables.get("src_scale"),
                feat_scale=tables.get("feat_scale"),
            )  # (P, V, C+3), (P, V)
        # running profiling checksum (see _frame_stage): accumulate every
        # intermediate so no stop program can DCE an earlier point stage
        # (the sigma and rgb branches are dataflow-independent)
        prof = stop_stage is not None
        ck = None
        if prof:
            ck = (
                tables.get("anchor", 0.0)
                + rgb_feat.sum().astype(jnp.float32)
                + view_mask.sum()
            )
        if stop_stage == "cull":
            return ({"dbg": ck}, None)

        # (6) density (:294-314). frame_mode also reads the level-1
        # trilinear occupancy off the same query (the reference tight cull)
        if mask_from_query is None:
            mask_from_query = frame_mode or self.sigma_query_cull
        kw = {} if octet_scales is None else {"scales": octet_scales}
        if tables.get("folded"):
            query = (
                lambda m, *a, **k: m.sigmahead.query_sigma_feat_octet_folded(
                    a[0][0], a[0][1], *a[1:], **k
                )
            )
        else:
            query = lambda m, *a, **k: m.sigmahead.query_sigma_feat_octet(
                *a, **k
            )
        if mask_from_query:
            sigma_feat, occ_l1 = apply(
                lambda m, *a, **k: query(m, *a, **k, with_l1_occ=True),
                octet_vols, dhw_c, out_sh, **kw,
            )
            sig_ok = sig_ok & (occ_l1.astype(jnp.float32) > 0)
        else:
            sigma_feat = apply(
                query, octet_vols, dhw_c, out_sh, **kw,
            )  # (P, 64)
        if prof:
            ck = ck + sigma_feat.sum().astype(jnp.float32)
        if stop_stage == "sigma_q":
            return ({"dbg": ck}, None)
        mean, var = fused_mean_variance(rgb_feat)  # (P, 1, C+3)
        num_valid_obs = view_mask.sum(axis=-1, keepdims=True)
        if prof:
            ck = (
                ck
                + mean.sum().astype(jnp.float32)
                + var.sum().astype(jnp.float32)
                + num_valid_obs.sum()
            )
        if stop_stage == "meanvar":
            return ({"dbg": ck}, None)
        sigma = apply(
            lambda m, *a: m.rgbhead.density(*a),
            sigma_feat, mean[:, 0], var[:, 0], num_valid_obs,
        )[:, 0]
        sigma = jnp.where(sig_ok, sigma.astype(jnp.float32), 0.0)
        alpha = 1.0 - jnp.exp(-sigma)
        if prof:
            ck = ck + alpha.sum()
        if stop_stage == "sigma":
            return ({"dbg": ck}, None)

        # (7) color head on the sigma frame, alpha-masked (:316-333). The
        # reference compacts alpha>1e-14 survivors before its color MLP; in
        # the rectangular frame the masked points get weight 0 in the
        # composite anyway, and running the MLP on the full sigma frame is
        # cheaper than a third nonzero + three row-gathers + an extra
        # scatter on this runtime.
        rgb = apply(
            lambda m, *a: m.rgbhead.color(*a),
            rgb_feat[:, None],
            mean[:, None],
            var[:, None],
        )[:, 0].astype(jnp.float32)  # (P, 3); composite in f32
        alpha_live = (alpha > 1e-14) & sig_ok
        if prof:
            ck = ck + rgb.sum() + alpha_live.sum()
        if stop_stage == "rgb":
            return ({"dbg": ck}, None)

        # (8) composite over the SLOT-major (K, ray) frame (:334-353).
        # Slots are ordered by ascending sample index == traversal order,
        # so the shifted-cumprod transmittance (BaseRender.py:94-95) runs
        # over the leading K axis with rays on the 128-lane axis. In
        # frame_mode the points already ARE the frame (reshape, no
        # scatter); compact mode scatters through sig_idx_t (slot-major, no
        # index remap).
        if frame_mode:
            alpha_kr = alpha.reshape(K, nr)
            rgb_chan = [
                jnp.where(alpha_live, rgb[:, c], 0.0).reshape(K, nr)
                for c in range(3)
            ]
        else:
            tgt = jnp.where(sig_ok, sig_idx_t, P)
            rgb_tgt = jnp.where(alpha_live, sig_idx_t, P)
            alpha_kr = (
                jnp.zeros((P,)).at[tgt].set(alpha, mode="drop").reshape(K, nr)
            )
            # per-channel (K, R) planes: a (K, R, 3) hold buffer puts 3 on
            # the lane axis (43x pad) and its einsum relayout measured
            # ~8 ms; three scalar scatters + plane multiplies are ~1 ms
            rgb_chan = [
                jnp.zeros((P,)).at[rgb_tgt].set(rgb[:, c], mode="drop")
                .reshape(K, nr)
                for c in range(3)
            ]
        T = jnp.concatenate(
            [
                jnp.ones((1, nr)),
                jnp.cumprod(1.0 - alpha_kr[:-1] + 1e-10, axis=0),
            ],
            axis=0,
        )
        weights = alpha_kr * T  # (K, nr)
        rgb_map = jnp.stack(
            [(weights * hc).sum(axis=0) for hc in rgb_chan], axis=-1
        )
        rgb_map = jnp.where(ray_ok[:, None], rgb_map, 0.0)
        stats = {
            "perray_overflow": perray_overflow,
            "sig_overflow": sig_overflow,
            "n_sigma": sig_ok.sum() if n_sigma is None else n_sigma,
            "n_rgb": alpha_live.sum(),
        }
        return rgb_map, stats

    def _occupied_world_pts(self, masks3d, batch):
        """The reference's dense occupied-voxel walk (demo_render.py:166-175):
        every voxel of the sum-over-levels occupancy field above threshold,
        mapped to world space (coord * 2.0 level-0 units). Returns
        (pts_w (N,3), row_ok (N,), min_xyz (3,), max_xyz (3,))."""
        D1, H1, W1 = masks3d.shape
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        R = batch["Rh"]
        Th = batch["Th"].reshape(1, 3)
        occ = (masks3d > self.occupancy_threshold).reshape(-1)
        vd = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 0)
        vh = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 1)
        vw = jax.lax.broadcasted_iota(jnp.int32, (D1, H1, W1), 2)
        vox_xyz = jnp.stack([vw, vh, vd], axis=-1).reshape(-1, 3)
        can_pts = vox_xyz.astype(jnp.float32) * 2.0 * vs + batch["bounds"][0]
        pts_w = can_pts @ R.T + Th
        row_ok = occ
        big = jnp.float32(1e9)
        okc = row_ok[:, None]
        min_xyz = jnp.where(okc, pts_w, big).min(axis=0)
        max_xyz = jnp.where(okc, pts_w, -big).max(axis=0)
        return pts_w, row_ok, min_xyz, max_xyz

    def _frame_stage(self, variables, batch, featmaps, stop_stage=None):
        """Per-frame stages (1)-(4): volume, occupancy, packed gather
        tables, tight AABB, pixel splat, ray extraction, near/far. Returns
        (pre, tables, rays) — or a {"dbg": ...} checksum dict for a
        stop_stage prefix. `rays` arrays are full-ray_cap; a multi-chip
        wrapper slices them across the mesh (parallel/dp.py)."""
        neg_ray = self.neg_ray_val
        head_vars = variables["head"]
        apply = lambda method, *a: self.nerfhead.apply(head_vars, *a, method=method)
        Himg, Wimg = batch["tar_img"].shape[0:2]
        from gpnerf_tpu.render.base import src_norm

        src_unnorm = src_norm(batch["src_imgs"]) * 0.5 + 0.5
        pre = self.prepare_frame(batch, featmaps, neg_ray=neg_ray)
        Himg, Wimg = batch["tar_img"].shape[0:2]
        grids = pre["grids"]
        out_sh = pre["out_sh"]
        S = self.n_samples
        K = self.samples_per_ray
        # ck: running checksum over every intermediate produced so far,
        # accumulated ONLY under a stop_stage (profiling) program and folded
        # into each stop's output, so XLA cannot dead-code-eliminate earlier
        # stages out of a truncated program — every stage prefix is a strict
        # superset of the previous one and profile() deltas attribute
        # honestly. Never computed in the production program.
        prof = stop_stage is not None
        ck = (
            sum(g.nbr.sum() for g in grids) + pre["smpl_feat"].sum()
            if prof
            else None
        )
        if stop_stage == "pre":
            return {"dbg": ck}

        if stop_stage == "codes":
            fused = apply(
                lambda m, s: m.sigmahead.fuse_codes(s), pre["smpl_feat"]
            )
            return {"dbg": fused.sum().astype(jnp.float32) + ck}

        # (2) volume + occupancy (demo_render.py:154-165). Both paths end
        # in dense per-level volumes (zero at inactive sites) — the direct
        # input for the occupancy field and the packed octet tables:
        #   dense_conv: eval-only dense-convolution stack (MXU convs over
        #     the level volumes instead of ~2.4M neighbor-row gathers);
        #   rows: the table-driven sparse convs + per-level dense scatter.
        from gpnerf_tpu.models.sparse_net import (
            occupancy_volume_dense,
            sparse_net_dense_eval,
        )
        from gpnerf_tpu.ops.sparse_conv import scatter_dense

        if self.dense_conv:
            fused = apply(
                lambda m, s: m.sigmahead.fuse_codes(s), pre["smpl_feat"]
            )
            vr = pre["vertex_rows"]
            code = jnp.where(
                (vr >= 0)[:, None], fused[jnp.maximum(vr, 0)], 0.0
            )
            vols = sparse_net_dense_eval(
                head_vars["params"]["sigmahead"]["xyzc_net"],
                head_vars["batch_stats"]["sigmahead"]["xyzc_net"],
                code, grids, compute_dtype=self.compute_dtype,
            )
            level_feats = None
            flat1 = None
            masks3d = occupancy_volume_dense(vols)
        else:
            level_feats = apply(
                lambda m, *a: m.volume(*a, train=False),
                pre["smpl_feat"], pre["vertex_rows"], grids,
            )
            # the LEVEL-1 volume is never materialized dense in the
            # quantized path: its octet table is corner-SCATTERED straight
            # from the ~16.9k active rows (build_octet_table_scatter, ~35 MB
            # of scatter traffic vs streaming the 228 MB table through the
            # slice-concat build, plus the dense f32 scatter + quantize
            # round-trip it replaced). The occupancy field comes from the
            # per-level channel-sum scatters (identical math to
            # channel-summing the dense volumes).
            from gpnerf_tpu.ops.sparse_conv import scatter_dense_rows

            flat1 = (
                None
                if self.quantize_volume
                else scatter_dense_rows(level_feats[0], grids[1])
            )
            vols = [None] + [
                scatter_dense(level_feats[i], grids[i + 1]) for i in (1, 2, 3)
            ]
            masks3d = occupancy_volume(level_feats, grids)
        if prof:
            ck = (
                ck
                + sum(
                    v.sum().astype(jnp.float32) for v in vols if v is not None
                )
                + (0.0 if flat1 is None else flat1.sum())
                + (
                    0.0
                    if level_feats is None
                    else level_feats[0].sum().astype(jnp.float32)
                )
            )
        if stop_stage == "fuse":
            return {"dbg": ck}
        # occupancy stays float32: masks3d feeds > occupancy_threshold
        # comparisons (voxel election, zmin splat) where bf16 rounding can
        # flip borderline voxels; vols are cast to compute_dtype only after
        # the occupancy field is built
        if prof:
            ck = ck + masks3d.sum()
        if stop_stage == "occv":
            return {"dbg": ck}
        if self.compute_dtype is not None:
            # per-point stages run reduced precision: gather tables and the
            # gathered rows halve their HBM traffic
            featmaps = featmaps.astype(self.compute_dtype)
            src_unnorm = src_unnorm.astype(self.compute_dtype)
            vols = [
                None if v is None else v.astype(self.compute_dtype)
                for v in vols
            ]
        # pack each trilinear footprint into one row (octet tables) — the
        # TPU analog of the reference's `.dense()` cache
        # (SparseConvNet.encode, SparseConvNet.py:126-143) laid out so every
        # per-point multi-scale query is ONE row-gather per level
        from gpnerf_tpu.ops.grid_sample import (
            build_octet_table_3d,
            build_quad_table_2d,
            quantize_volume_u8,
            resample_volume_to,
        )

        if self.merge_coarse_octet:
            # two tables: level-1 + combined [l2|l3|l4] resampled onto the
            # level-2 grid (dense separable matmuls) — 2 per-point gathers
            # instead of 4 in the multi-scale query
            sh2 = vols[1].shape[:3]
            combined = jnp.concatenate(
                [
                    vols[1].astype(jnp.float32),
                    resample_volume_to(vols[2], sh2, out_sh // 4, out_sh // 8),
                    resample_volume_to(vols[3], sh2, out_sh // 4, out_sh // 16),
                ],
                axis=-1,
            )
            if self.fold_coarse_fc:
                # pre-apply out_geometry_fc's coarse block to the volume:
                # trilinear is linear, so querying W2 @ v equals applying W2
                # after the query — one dense MXU matmul per frame shrinks
                # the coarse octet rows 96 -> 64 channels (25% of the
                # dominant per-point gather bytes). The per-point linear
                # keeps only its level-1 block (query_sigma_feat_octet_folded
                # / pack_head_weights fold_nch). Exact in f32; the folded
                # field is signed, so its quantization is int8.
                nch1 = self.nerfhead.spconv_out_dim[0]
                w_coarse = head_vars["params"]["sigmahead"][
                    "out_geometry_fc"
                ]["dense_0"]["kernel"][nch1:]
                combined = jnp.einsum(
                    "dhwc,co->dhwo", combined, w_coarse.astype(jnp.float32)
                )
            dense_list = [vols[0], combined]
        else:
            dense_list = vols
        sh1 = tuple(grids[1].shape)
        octet_scales = None
        if self.quantize_volume:
            from gpnerf_tpu.ops.grid_sample import (
                build_octet_table_3d_u32,
                build_octet_table_scatter,
            )

            build = (
                build_octet_table_3d_u32
                if self.pack_octet_u32
                else build_octet_table_3d
            )
            octet_vols, octet_scales = [], []
            for i, vol in enumerate(dense_list):
                if i == 0 and vol is None and level_feats is not None:
                    # level-1: quantize the ACTIVE rows (their max equals
                    # the dense volume's max — post-ReLU, zeros elsewhere)
                    # and corner-scatter them straight into the flat table
                    g1 = grids[1]
                    rows0 = jnp.where(
                        g1.valid[:, None], level_feats[0], 0.0
                    )
                    q_rows, sc = quantize_volume_u8(rows0)
                    if self.l1_nearest:
                        # nearest-sampled level-1: ONE scatter of the
                        # active rows into a flat (D*H*W, C) u8 table —
                        # 32 B/point gathers (vs the 256 B octet row), no
                        # 8-corner weighted sum, and no 8x corner-scatter
                        # table build. At l1_nearest >= 2 the field is
                        # first trilinearly upsampled onto the level-0
                        # grid (bf16 separable matmuls) so the
                        # piecewise-constant step halves to half a
                        # level-0 voxel
                        from gpnerf_tpu.ops.grid_sample import NearestTable
                        from gpnerf_tpu.ops.sparse_conv import (
                            scatter_dense_rows,
                        )

                        flat_rows = scatter_dense_rows(q_rows, g1)
                        if self.l1_nearest >= 10:
                            # 10 + d/h/w bitmask: LINEAR along the set
                            # axes from the same flat rows (2^popcount
                            # 32 B corner gathers), nearest on the rest
                            octet_vols.append(
                                NearestTable(
                                    flat_rows, tuple(g1.shape), 2, 1,
                                    self.l1_nearest - 10,
                                )
                            )
                        elif self.l1_nearest >= 2:
                            # exact u8 midpoint-interleave doubling (int16
                            # math, stack+reshape copies): half-voxel
                            # rounding, no f32 volumes. A dense bf16
                            # resample_volume_to here measured 34 ms/frame
                            # of relayout copies — rejected
                            from gpnerf_tpu.ops.grid_sample import (
                                interleave_midpoints_3d,
                            )

                            C1 = q_rows.shape[-1]
                            up = interleave_midpoints_3d(
                                flat_rows.reshape(tuple(g1.shape) + (C1,))
                            )
                            octet_vols.append(
                                NearestTable(
                                    up.reshape(-1, C1), up.shape[:3], 2, 2
                                )
                            )
                        else:
                            octet_vols.append(
                                NearestTable(flat_rows, tuple(g1.shape), 2)
                            )
                        octet_scales.append(sc)
                        continue
                    octet_vols.append(
                        build_octet_table_scatter(
                            q_rows, g1.coords, g1.valid, g1.shape
                        )
                    )
                    octet_scales.append(sc)
                    continue
                if i == 1 and self.coarse_nearest:
                    # folded coarse, nearest-sampled: flat per-voxel i8 rows
                    # (64 B/point vs the 512 B trilinear octet row). At
                    # coarse_nearest >= 2 the field is first upsampled onto
                    # the level-1 grid (dense separable matmuls) so the
                    # piecewise-constant step halves — total table bytes
                    # match the level-2 octet form, per-point gather bytes
                    # stay 8x lower
                    from gpnerf_tpu.ops.grid_sample import (
                        NearestTable,
                        quantize_image_i8,
                    )

                    if self.coarse_nearest >= 2:
                        vol = resample_volume_to(
                            vol, tuple(grids[1].shape), out_sh // 2,
                            out_sh // 4,
                        )
                        div = 2
                    else:
                        div = 4
                    q, sc = quantize_image_i8(vol)
                    octet_vols.append(
                        NearestTable(
                            q.reshape(-1, q.shape[-1]), vol.shape[:3], div
                        )
                    )
                    octet_scales.append(sc)
                    continue
                if i == 1 and self.int4_coarse:
                    # folded coarse, int4 split-packed: 2 channels/byte
                    from gpnerf_tpu.ops.grid_sample import (
                        Int4Table,
                        quantize_volume_i4,
                    )

                    q, sc = quantize_volume_i4(vol)
                    octet_vols.append(Int4Table(build_octet_table_3d(q)))
                    octet_scales.append(sc)
                    continue
                if i == 1 and self.fold_coarse_fc:
                    # folded coarse field is signed -> int8 quantization
                    from gpnerf_tpu.ops.grid_sample import quantize_image_i8

                    q, sc = quantize_image_i8(vol)
                else:
                    q, sc = quantize_volume_u8(vol)
                octet_vols.append(build(q))
                octet_scales.append(sc)
        else:
            if flat1 is not None:
                v1 = flat1.reshape(sh1 + (flat1.shape[-1],))
                if self.compute_dtype is not None:
                    v1 = v1.astype(self.compute_dtype)
                dense_list = [v1] + list(dense_list[1:])
            octet_vols = [build_octet_table_3d(v) for v in dense_list]
        # packed bilinear tables for the projection gathers (one row-gather
        # per point/view/map instead of four). With merge_src_feat the
        # encoder features are upsampled to source resolution (exact-class
        # align-corners reinterpolation, separable matmuls) and packed WITH
        # the rgb into one [rgb|feat] table — one gather per (point, view).
        src_scale = None
        feat_scale = None
        if self.merge_src_feat:
            from gpnerf_tpu.ops.grid_sample import upsample_image_align_corners

            Hs, Ws = src_unnorm.shape[1:3]
            feat_up = upsample_image_align_corners(featmaps, Hs, Ws)
            comb = jnp.concatenate(
                [src_unnorm.astype(jnp.float32), feat_up], axis=-1
            )
            if self.compute_dtype is not None:
                comb = comb.astype(self.compute_dtype)
            src_quad = build_quad_table_2d(comb)  # (V, H+1, W+1, 140)
            feat_quad = None
            proj_scale = None
        elif self.merge_lowres_src:
            # opposite merge: source rgb DOWNSAMPLED (align-corners
            # bilinear) to the encoder feature grid and packed with the
            # features into one small [rgb|feat] table — one gather per
            # (point, view) at the cost of rgb detail above the feature
            # grid's Nyquist
            from gpnerf_tpu.ops.grid_sample import upsample_image_align_corners

            Hf, Wf = featmaps.shape[1:3]
            src_low = upsample_image_align_corners(
                src_unnorm.astype(jnp.float32), Hf, Wf
            )
            comb = jnp.concatenate(
                [src_low, featmaps.astype(jnp.float32)], axis=-1
            )
            if self.quantize_proj:
                from gpnerf_tpu.ops.grid_sample import quantize_image_i8

                qc, proj_scale = quantize_image_i8(comb)
                src_quad = build_quad_table_2d(qc)  # int8 rows, half bytes
            else:
                if self.compute_dtype is not None:
                    comb = comb.astype(self.compute_dtype)
                src_quad = build_quad_table_2d(comb)  # (V, Hf+1, Wf+1, 140)
                proj_scale = None
            feat_quad = None
        else:
            # split tables (reference semantics: rgb at FULL source
            # resolution, demo_render.py:586). Source images arrive as the
            # raw uint8 bytes they were on disk (src_norm docstring), so
            # the src table stores those bytes directly with a 1/255
            # dequant applied after the bilinear weighted sum — EXACT, and
            # 4x fewer gathered bytes than the f32/bf16 rows on the
            # dominant per-point random-gather path
            if batch["src_imgs"].dtype == jnp.uint8:
                src_quad = build_quad_table_2d(batch["src_imgs"])
                src_scale = jnp.full((3,), 1.0 / 255.0, jnp.float32)
            else:
                src_quad = build_quad_table_2d(src_unnorm)
            use_int4 = (
                self.int4_feat
                and self.pallas_point
                and jax.default_backend() == "tpu"
            )  # kernel-only unpack: mirror the use_fused gate
            if self.quantize_proj and use_int4:
                # int4 split-pack (kernel-only unpack): halves the row
                # bytes of the split mode's dominant per-point VMEM gather
                from gpnerf_tpu.ops.grid_sample import quantize_image_i4

                qf, feat_scale = quantize_image_i4(
                    featmaps.astype(jnp.float32)
                )
                feat_quad = build_quad_table_2d(qf)
            elif self.quantize_proj:
                # int8-quantize the encoder-feature table too (per-channel
                # symmetric, dequant after the bilinear sum — the same
                # machinery as the merged table): 4x fewer bytes on the
                # split mode's dominant per-point gather
                from gpnerf_tpu.ops.grid_sample import quantize_image_i8

                qf, feat_scale = quantize_image_i8(
                    featmaps.astype(jnp.float32)
                )
                feat_quad = build_quad_table_2d(qf)
            else:
                feat_quad = build_quad_table_2d(featmaps)
                feat_scale = None
            proj_scale = None
        if prof:
            ck = (
                ck
                + sum(
                    (
                        v.rows
                        if hasattr(v, "rows")
                        else (v.table if hasattr(v, "table") else v)
                    )
                    .sum()
                    .astype(jnp.float32)
                    for v in octet_vols
                )
                + src_quad.sum().astype(jnp.float32)
                + (
                    0.0
                    if feat_quad is None
                    else feat_quad.sum().astype(jnp.float32)
                )
            )
        if stop_stage == "volume":
            return {"dbg": ck}

        # occupied voxels -> world points. With tight_cull the splat source
        # is the compacted level-1 active set (occupied voxels are a subset
        # of it); reference-cull mode walks the dense sum-over-levels field
        # like demo_render.py:166 (occupied voxels extend ~8cm beyond the
        # level-1 actives there).
        vs = jnp.asarray(self.voxel_size, jnp.float32)
        R = batch["Rh"]
        Th = batch["Th"].reshape(1, 3)
        splat_overflow = jnp.int32(0)
        if self.tight_cull:
            g1 = grids[1]
            mval = masks3d[
                jnp.clip(g1.coords[:, 0], 0, masks3d.shape[0] - 1),
                jnp.clip(g1.coords[:, 1], 0, masks3d.shape[1] - 1),
                jnp.clip(g1.coords[:, 2], 0, masks3d.shape[2] - 1),
            ]
            row_ok = g1.valid & (mval > self.occupancy_threshold)
            # dhw -> xyz order, *2.0 to level-0 units (demo_render.py:140-143)
            vox_xyz = g1.coords[:, ::-1].astype(jnp.float32) * 2.0
            can_pts = vox_xyz * vs + batch["bounds"][0]
            pts_w = can_pts @ R.T + Th
            big = jnp.float32(1e9)
            okc = row_ok[:, None]
            min_xyz = jnp.where(okc, pts_w, big).min(axis=0)
            max_xyz = jnp.where(okc, pts_w, -big).max(axis=0)
        else:
            pts_w, row_ok, min_xyz, max_xyz = self._occupied_world_pts(
                masks3d, batch
            )
            if self.splat_cap:
                # compact the blanket-occupied voxels to a static cap
                # before the splat scatters: the dense sum-over-levels walk
                # feeds ~860k rows (mostly empty) into 4 scatter passes +
                # the bin splat; the occupied set is ~10x smaller. EXACT
                # when drop-free (splatting every occupied voxel — the
                # overflow counter below turns any drop into a hard
                # ray_overflow failure, same class as a dropped ray: a
                # dropped splat voxel can lose pixels).
                sidx, row_ok, splat_overflow = _compact(
                    row_ok, self.splat_cap
                )
                pts_w = pts_w[jnp.minimum(sidx, pts_w.shape[0] - 1)]
        min_xyz = min_xyz - jnp.asarray([0.0, 0.0, 0.05])
        max_xyz = max_xyz + jnp.asarray([0.0, 0.0, 0.05])
        can_bounds = jnp.stack([min_xyz, max_xyz])  # (demo :168-175)

        # (3) splat occupied voxels into the target view (:179-199)
        pixmask, zmin_flat, corners = self._splat_pixels(
            pts_w, row_ok, batch, Himg, Wimg
        )
        # front-depth image: 4-neighborhood min fills dilation-only pixels
        # and guards against splat-granularity overshoot (windowed tap)
        zm = zmin_flat.reshape(Himg, Wimg)
        zm = jnp.minimum(
            jnp.minimum(zm, jnp.minimum(jnp.roll(zm, 1, 0), jnp.roll(zm, -1, 0))),
            jnp.minimum(jnp.roll(zm, 1, 1), jnp.roll(zm, -1, 1)),
        )
        zmin_flat = zm.reshape(-1)
        if self.tight_cull:
            # level-1 voxel spacing (~1 cm) can project to >2 px at close
            # range; one 4-neighborhood pixel dilation closes the gaps the
            # reference's dense per-voxel walk never has
            pm = pixmask.reshape(Himg, Wimg)
            pm = (
                pm
                | jnp.roll(pm, 1, 0) | jnp.roll(pm, -1, 0)
                | jnp.roll(pm, 1, 1) | jnp.roll(pm, -1, 1)
            )
            pixmask = pm.reshape(-1)

        # (3b) ray extraction (:200-211)
        oob = Himg * Wimg
        pix_idx, ray_ok, ray_overflow = _compact(pixmask > 0, self.ray_cap)
        # splat-voxel drops are the same hard-failure class as ray drops
        # (a dropped voxel can lose pixels): fold them into ray_overflow so
        # the bench/eval zero-overflow gates catch an undersized splat_cap
        ray_overflow = ray_overflow + splat_overflow
        jj = jnp.minimum(pix_idx, oob - 1) // Wimg
        ii = jnp.minimum(pix_idx, oob - 1) % Wimg
        xy1 = jnp.stack([ii, jj, jnp.ones_like(ii)], axis=-1).astype(jnp.float32)
        tp = batch["target_pose"]
        rays_o, rays_d = pixel_rays(
            xy1, batch["target_K_inv"], tp[:, :3], tp[:, 3:]
        )

        # (4) near/far on the reference 64-sample grid (:212-245)
        near, far, mask_at_box = ray_aabb_near_far(
            rays_o, rays_d, can_bounds, neg_ray=neg_ray
        )
        ray_ok = ray_ok & mask_at_box
        if prof:
            ck = (
                ck
                + near.sum()
                + far.sum()
                + ray_ok.sum()
                + zmin_flat.sum()
                + pix_idx.sum().astype(jnp.float32)
            )
        if stop_stage == "rays":
            return {"dbg": ck}

        # Direction-agnostic: bins index the signed ray t-parameter grid
        # (ray_aabb_near_far signs both distances), so the same scatter
        # covers neg_ray (THuman) targets; _ray_pipeline flips traversal.
        use_bins = self.splat_bins and self.tight_cull
        if use_bins:
            # splat-bin cull: the occupancy signal rides the splat itself
            # (per-pixel depth-bin masks); no byte occupancy volume, no
            # per-sample tap gathers
            binimg = self._splat_bins(
                pts_w, row_ok, batch, Himg, Wimg, can_bounds, *corners
            )  # (H*W, S) u8
            bins = binimg[jnp.minimum(pix_idx, oob - 1)]  # (ray_cap, S) u8
            occb = None
        else:
            bins = None
            # occupancy-cull byte volume (one-voxel dilated; _ray_pipeline)
            if self.tight_cull:
                if level_feats is not None:
                    cull_vol = occupancy_volume(
                        level_feats, grids, levels=(0,)
                    )
                else:
                    cull_vol = occupancy_volume_dense(vols, levels=(0,))
            else:
                cull_vol = masks3d
            occb = cull_vol > 0
            for ax in range(3):
                occb = (
                    occb
                    | jnp.roll(occb, 1, axis=ax)
                    | jnp.roll(occb, -1, axis=ax)
                )
            occb = occb.astype(jnp.uint8)  # byte gathers: less random traffic
        tables = {
            "occb": occb,
            "octet_vols": octet_vols,
            "octet_scales": octet_scales,
            "src_quad": src_quad,
            "feat_quad": feat_quad,
            "proj_scale": proj_scale,
            "src_scale": src_scale,
            "feat_scale": feat_scale,
            "folded": self.fold_coarse_fc,
        }
        if prof:
            if bins is not None:
                ck = ck + bins.astype(jnp.float32).sum()
            if occb is not None:
                ck = ck + occb.astype(jnp.float32).sum()
            tables["anchor"] = ck
        return pre, tables, {
            "rays_o": rays_o,
            "rays_d": rays_d,
            "near": near,
            "far": far,
            "zmin": zmin_flat[jnp.minimum(pix_idx, oob - 1)],
            "ray_ok": ray_ok,
            "pix_idx": pix_idx,
            "ray_overflow": ray_overflow,
            "can_bounds": can_bounds,
            "bins": bins,
        }

    def _demo_impl(self, variables, batch, featmaps, stop_stage=None):
        """Full single-chip progressive render: frame stage + ray pipeline +
        image assembly. stop_stage (static) truncates for profiling."""
        out = self._frame_stage(variables, batch, featmaps, stop_stage=stop_stage)
        if isinstance(out, dict):
            return out  # stage checksum
        pre, tables, rd = out
        Himg, Wimg = batch["tar_img"].shape[0:2]
        oob = Himg * Wimg
        pix_idx = rd["pix_idx"]
        ray_ok = rd["ray_ok"]
        rgb_map, stats = self._ray_pipeline(
            variables["head"], batch, pre, tables,
            rd["rays_o"], rd["rays_d"], rd["near"], rd["far"], ray_ok,
            zmin=rd["zmin"], bins=rd["bins"], stop_stage=stop_stage,
        )
        if stats is None:
            return rgb_map  # the pipeline returned a stage checksum dict
        perray_overflow = stats["perray_overflow"]
        sig_overflow = stats["sig_overflow"]
        rgb_overflow = jnp.int32(0)  # color head is alpha-masked, no cap
        # per-channel plane scatters: a (H*W, 3) scatter pads the 3-lane
        # minor axis to 128 on TPU (42x padded write, measured ~1.7 ms);
        # three (H*W,) scatters + a host-side transpose are ~free
        tgt_pix = jnp.where(ray_ok, pix_idx, oob)
        pred_chw = jnp.stack(
            [
                jnp.zeros((Himg * Wimg,)).at[tgt_pix].set(
                    rgb_map[:, c], mode="drop"
                )
                for c in range(3)
            ]
        ).reshape(3, Himg, Wimg)
        maskimg_flat = (
            jnp.zeros((Himg * Wimg,), bool)
            .at[tgt_pix]
            .set(True, mode="drop")
        )
        return {
            "rgb_map": rgb_map,
            "pred_chw": pred_chw,
            "mask_at_box": maskimg_flat,
            "ray_pix_idx": pix_idx,
            "ray_ok": ray_ok,
            "overflows": jnp.stack(
                [rd["ray_overflow"], perray_overflow, sig_overflow, rgb_overflow]
            ),
            # occupancy statistics for cap tuning: rays / sigma points /
            # color points actually used this frame
            "counts": jnp.stack(
                [ray_ok.sum(), stats["n_sigma"], stats["n_rgb"]]
            ),
            "can_bounds": rd["can_bounds"],
        }

    # ------------------------------------------------------------------
    def render_demo_fn(self):
        """(variables, batch) -> ret, ONE fused program (encoder included):
        on a networked runtime each program execution pays a ~30 ms dispatch
        round-trip, so the throughput path fuses; `render()` uses the split
        jits when per-stage etime is requested."""
        if getattr(self, "_demo_fused", None) is None:
            @jax.jit
            def fused(variables, batch):
                from gpnerf_tpu.render.base import src_norm

                featmaps = self.encoder.apply(
                    variables["encoder"], src_norm(batch["src_imgs"])
                )
                return self._demo_impl(variables, batch, featmaps)

            self._demo_fused = fused
        return self._demo_fused

    def render_demo_scan_fn(self):
        """(variables, stacked_batches, order) -> per-frame reduced outputs,
        rendering order[i]-indexed frames SEQUENTIALLY inside one jitted
        lax.scan program. One dispatch covers the whole sequence, so the
        measurement excludes per-call host/tunnel round-trips — on a
        networked runtime the per-frame async-dispatch loop was observed to
        swing 39 -> 55 ms/frame between sessions (BENCH_r03) purely from
        dispatch-path latency while the device-side program is
        static-shape-deterministic. Returns {"overflows", "counts",
        "checksum"} stacked per frame; the checksum sums `pred_chw` and
        `mask_at_box` so no frame work is dead-code-eliminated."""
        if getattr(self, "_demo_scan", None) is None:

            @jax.jit
            def scanned(variables, stacked, order):
                from gpnerf_tpu.render.base import src_norm

                def body(_, i):
                    b = jax.tree_util.tree_map(lambda x: x[i], stacked)
                    featmaps = self.encoder.apply(
                        variables["encoder"], src_norm(b["src_imgs"])
                    )
                    ret = self._demo_impl(variables, b, featmaps)
                    out = {
                        "overflows": ret["overflows"],
                        "counts": ret["counts"],
                        "checksum": ret["pred_chw"].sum()
                        + ret["rgb_map"].sum()
                        + ret["mask_at_box"].sum(),
                    }
                    return 0, out

                _, outs = jax.lax.scan(body, 0, order)
                return outs

            self._demo_scan = scanned
        return self._demo_scan

    def render(self, variables, batch, rng=None):
        """Reference-style entry (demo_render.render :429-498): returns the
        full dict plus host-measured etime (encoder) and rtime (progressive
        remainder), blocking per stage like the reference's
        cuda.synchronize brackets."""
        enc = self.encode_fn()
        if self._demo_jit is None:
            self._demo_jit = jax.jit(self._demo_impl)
        t0 = time.time()
        featmaps = jax.block_until_ready(enc(variables, batch["src_imgs"]))
        etime = time.time() - t0
        t0 = time.time()
        ret = jax.block_until_ready(self._demo_jit(variables, batch, featmaps))
        ret = dict(ret)
        ret["etime"] = etime
        ret["rtime"] = time.time() - t0
        self._last_etime = etime
        return ret

    def profile(self, variables, batch) -> Dict[str, Any]:
        """Per-stage wall-clock, keyed by the reference's time_slots names
        (demo_render.py:97-357): stage-prefix jits are timed and their
        deltas mapped onto the closest reference slot. `etime`/`rtime` match
        demo_render.py:494-497.

        Every stop-stage program folds a checksum of ALL prior side
        products (octet/quad tables, occupancy, bins — tables["anchor"])
        into its output, so XLA cannot dead-code-eliminate earlier stages
        out of a truncated program: each prefix is a strict superset of the
        previous one and the deltas attribute honestly. The anchor sums
        themselves cost ~0.5 ms that the FULL program does not pay, so the
        final delta (rgb_f) is under-credited by about that much.

        When the point-stage megakernel is enabled (tpu.pallas_point), it
        only runs in FULL programs (stop-stage prefixes fall back to the
        op-by-op path) — mixing the two would corrupt the final delta
        (ADVICE r4). So the stage ladder here runs with pallas_point forced
        OFF for every program (consistent op-by-op attribution), and the
        production fused program is timed separately as
        `rtime_production`."""
        from functools import partial

        enc = self.encode_fn()
        t0 = time.time()
        featmaps = jax.block_until_ready(enc(variables, batch["src_imgs"]))
        etime = time.time() - t0

        stages = ("volume", "rays", "cull_occ", "cull_compact", "cull",
                  "sigma_q", "sigma", None)
        totals = {}
        rtime_production = None
        orig_pp = self.pallas_point
        try:
            if orig_pp:
                fnp = jax.jit(partial(self._demo_impl, stop_stage=None))
                jax.block_until_ready(fnp(variables, batch, featmaps))
                t0 = time.time()
                jax.block_until_ready(fnp(variables, batch, featmaps))
                rtime_production = time.time() - t0
                self.pallas_point = False
            for stage in stages:
                fn = jax.jit(partial(self._demo_impl, stop_stage=stage))
                jax.block_until_ready(fn(variables, batch, featmaps))
                t0 = time.time()
                jax.block_until_ready(fn(variables, batch, featmaps))
                totals[stage] = time.time() - t0
        finally:
            self.pallas_point = orig_pp
        prev = 0.0
        deltas = {}
        for stage in stages:
            deltas[stage] = totals[stage] - prev
            prev = totals[stage]
        # map onto the reference slot names (demo_render.py time_slots)
        time_slots = {
            "bc_attn": 0.0,                    # code fusion folded into
            "sigma_attn": 0.0,                 # sp_encode (one fused jit)
            "sigma_c": 0.0,
            "sp_encode": deltas["volume"],     # fuse+conv+occupancy+dense
            "bc_time": deltas["rays"],         # splat + rays + near/far
            "bf_sigma": deltas["cull_occ"] + deltas["cull_compact"]
            + deltas["cull"] + deltas["sigma_q"],  # culls + proj/octet gathers
            "sigma_f": deltas["sigma"],        # mean/var + density MLP
            "bf_rgb": 0.0,                     # alpha cull + color gather
            "rgb_f": deltas[None],             # color MLP + composite
            "bc_render": 0.0,
        }
        out = {"etime": etime, "rtime": totals[None], "time_slots": time_slots}
        if rtime_production is not None:
            out["rtime_production"] = rtime_production
        return out


    # ------------------------------------------------------------------
    def _mesh_fns_demo(self):
        if getattr(self, "_mesh_demo_jits", None) is None:

            @jax.jit
            def vol_fn(variables, batch):
                from gpnerf_tpu.render.base import src_norm

                featmaps = self.encoder.apply(
                    variables["encoder"], src_norm(batch["src_imgs"])
                )
                pre = self.prepare_frame(
                    batch, featmaps, neg_ray=self.neg_ray_val
                )
                level_feats = self.nerfhead.apply(
                    variables["head"], pre["smpl_feat"], pre["vertex_rows"],
                    pre["grids"], train=False,
                    method=lambda m, *a, **kw: m.volume(*a, **kw),
                )
                masks3d = occupancy_volume(level_feats, pre["grids"])
                _, _, min_xyz, max_xyz = self._occupied_world_pts(
                    masks3d, batch
                )
                can_bounds = jnp.stack(
                    [
                        min_xyz - jnp.asarray([0.0, 0.0, 0.05]),
                        max_xyz + jnp.asarray([0.0, 0.0, 0.05]),
                    ]
                )
                dense_vols = self.materialize_dense(level_feats, pre["grids"])
                return (featmaps, pre["KE"], dense_vols, pre["out_sh"],
                        masks3d, can_bounds)

            @jax.jit
            def chunk_fn(variables, featmaps, KE, dense_vols, out_sh,
                         masks3d, batch, pts):
                from gpnerf_tpu.ops.grid_sample import trilinear_dense_gather
                from gpnerf_tpu.ops.projection import project_and_gather
                from gpnerf_tpu.render.base import src_norm

                dhw = self.points_to_dhw_vox(pts, batch)
                size1 = out_sh // 2
                pos1 = dhw / out_sh.astype(jnp.float32) * (
                    size1 - 1
                ).astype(jnp.float32)
                occ = trilinear_dense_gather(masks3d, pos1, dyn_size=size1)
                sigma_feat = self.nerfhead.apply(
                    variables["head"], dense_vols, dhw, out_sh,
                    method=lambda m, *a: m.sigmahead.query_sigma_feat_dense(*a),
                )
                H, W = batch["src_imgs"].shape[1:3]
                rgb_feat, vm = project_and_gather(
                    pts, KE, src_norm(batch["src_imgs"]) * 0.5 + 0.5,
                    featmaps, H, W, neg_ray=self.neg_ray_val,
                )
                mean, var = fused_mean_variance(rgb_feat)
                nvo = vm.sum(axis=-1, keepdims=True)
                sigma = self.nerfhead.apply(
                    variables["head"], sigma_feat, mean[:, 0], var[:, 0], nvo,
                    method=lambda m, *a: m.rgbhead.density(*a),
                )[:, 0]
                # the reference culls to sp_feats > 0 survivors
                # (demo_render.py:253-259); culled grid points keep alpha 0
                return jnp.where(occ > 0, sigma, 0.0)

            self._mesh_demo_jits = (vol_fn, chunk_fn)
        return self._mesh_demo_jits

    def render_mesh(self, variables, batch_np, chunk=65536):
        """Occupancy-driven mesh branch (demo_render.py:249-268,366-376):
        the mesh grid comes from the occupancy field's world AABB alone — no
        dataset-supplied `pts`/`inside` visual hull (which
        BaseRender.render_mesh requires): dense grid over can_bounds at
        voxel_size, occupancy cull (trilinear masks3d > 0), density-MLP
        sigma, alpha cube padded 10, marching cubes at mesh_th."""
        import numpy as np

        from gpnerf_tpu.ops.marching_cubes import marching_cubes
        from gpnerf_tpu.utils.mesh_io import Trimesh

        vol_fn, chunk_fn = self._mesh_fns_demo()
        batch = {
            k: jnp.asarray(v)
            for k, v in batch_np.items()
            if k not in ("pts", "inside")
        }
        featmaps, KE, dense_vols, out_sh, masks3d, can_bounds = vol_fn(
            variables, batch
        )
        cb = np.asarray(can_bounds)
        vs = np.asarray(self.voxel_size, np.float64)
        axes = [
            np.arange(cb[0, i], cb[1, i] + vs[i], vs[i]) for i in range(3)
        ]
        pts = np.stack(
            np.meshgrid(*axes, indexing="ij"), axis=-1
        ).astype(np.float32)
        sh = pts.shape[:3]
        flat = pts.reshape(-1, 3)
        n = len(flat)
        n_pad = (-n) % chunk
        flat = np.concatenate([flat, np.zeros((n_pad, 3), np.float32)])
        sigmas = []
        for i in range(0, len(flat), chunk):
            s = chunk_fn(
                variables, featmaps, KE, dense_vols, out_sh, masks3d, batch,
                jnp.asarray(flat[i : i + chunk]),
            )
            sigmas.append(np.asarray(s))
        sigma = np.concatenate(sigmas)[:n]
        alpha = 1.0 - np.exp(-sigma)
        cube = np.pad(alpha.reshape(sh), 10, mode="constant")
        vertices, triangles = marching_cubes(cube, self.mesh_th)
        return {"cube": cube, "mesh": Trimesh(vertices, triangles)}


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
        samples_per_ray=cfg.tpu.samples_per_ray,
        quantize_volume=cfg.tpu.quantize_volume,
        tap_window=cfg.tpu.tap_window,
        merge_coarse_octet=cfg.tpu.merge_coarse_octet,
        fold_coarse_fc=cfg.tpu.fold_coarse_fc,
        int4_coarse=cfg.tpu.int4_coarse,
        coarse_nearest=cfg.tpu.coarse_nearest,
        l1_nearest=cfg.tpu.l1_nearest,
        dense_conv=cfg.tpu.dense_conv,
        merge_src_feat=cfg.tpu.merge_src_feat,
        merge_lowres_src=cfg.tpu.merge_lowres_src,
        frame_mode=cfg.tpu.frame_mode,
        dense_slots=cfg.tpu.dense_slots,
        window_margin_voxels=cfg.tpu.window_margin_voxels,
        splat_bins=cfg.tpu.splat_bins,
        bin_margin_voxels=cfg.tpu.bin_margin_voxels,
        quantize_proj=cfg.tpu.quantize_proj,
        pack_octet_u32=cfg.tpu.pack_octet_u32,
        proj_vp_order=cfg.tpu.proj_vp_order,
        pallas_lerp=cfg.tpu.pallas_lerp,
        pallas_point=cfg.tpu.pallas_point,
        splat_cap=cfg.tpu.splat_cap,
        kernel_octet=cfg.tpu.kernel_octet,
        sigma_query_cull=cfg.tpu.sigma_query_cull,
        int4_feat=cfg.tpu.int4_feat,
    )


register("render", "DemoRender", build_render)
