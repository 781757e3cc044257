"""Multi-view projection + feature gathering (the reference `Projector`).

JAX counterpart of /root/reference/libs/renders/BaseRender.py:278-363 and
demo_render.py:505-632: project query points into each source camera,
normalize pixel coords to [-1, 1] (align_corners convention), gather source
RGB and encoder features bilinearly, and build the per-view validity mask
(in-bounds AND in-front-of-camera, with the THuman `neg_ray` sign flip at
BaseRender.py:319-322).

Instead of the reference's packed 34-float IBRNet camera vectors
(BaseRender.py:233-247) we pass K_h (V,4,4) and pose_h (V,4,4) directly; the
product K_h @ pose_h is precomputed once per frame.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpnerf_tpu.ops.grid_sample import grid_sample_2d_nhwc


def compute_projections(xyz, KE, *, neg_ray=False):
    """Project points into V cameras.

    Args:
      xyz: (P, 3) world points.
      KE: (V, 4, 4) intrinsics @ extrinsics (homogeneous).
      neg_ray: valid when behind camera (THuman).

    Returns:
      pixel_xy: (V, P, 2) clamped to +-1e6 (BaseRender.py:317).
      in_front: (V, P) bool.
    """
    xyz_h = jnp.concatenate([xyz, jnp.ones_like(xyz[..., :1])], axis=-1)
    proj = jnp.einsum("vij,pj->vpi", KE, xyz_h)  # (V, P, 4)
    pixel = proj[..., :2] / proj[..., 2:3]
    pixel = jnp.clip(pixel, -1e6, 1e6)
    in_front = proj[..., 2] < 0 if neg_ray else proj[..., 2] > 0
    return pixel, in_front


def normalize_pixels(pixel_xy, h, w):
    """Pixel coords -> [-1, 1] with the (size-1) denominator
    (BaseRender.py:296-299, align_corners=True convention)."""
    scale = jnp.asarray([w - 1.0, h - 1.0], dtype=pixel_xy.dtype)
    return 2.0 * pixel_xy / scale - 1.0


def inbound_mask(pixel_xy, h, w):
    """(BaseRender.py:283-294)."""
    return (
        (pixel_xy[..., 0] <= w - 1.0)
        & (pixel_xy[..., 0] >= 0)
        & (pixel_xy[..., 1] <= h - 1.0)
        & (pixel_xy[..., 1] >= 0)
    )


def project_and_gather(xyz, KE, src_imgs, featmaps, h, w, *, neg_ray=False):
    """The reference `Projector.compute` (BaseRender.py:326-363).

    Args:
      xyz: (P, 3) query points (flattened rays x samples).
      KE: (V, 4, 4) K_h @ pose_h per source view.
      src_imgs: (V, H, W, 3) un-normalized source images (NHWC).
      featmaps: (V, Hf, Wf, C) encoder feature maps (NHWC).
      h, w: source image size (pixel-coordinate frame of K).

    Returns:
      rgb_feat: (P, V, 3 + C) gathered rgb + features.
      mask: (P, V) float validity (in-bounds * in-front).
    """
    pixel, in_front = compute_projections(xyz, KE, neg_ray=neg_ray)  # (V,P,2)
    norm_pix = normalize_pixels(pixel, h, w)
    rgb = grid_sample_2d_nhwc(src_imgs, norm_pix)  # (V, P, 3)
    feat = grid_sample_2d_nhwc(featmaps, norm_pix)  # (V, P, C)
    rgb_feat = jnp.concatenate([rgb, feat], axis=-1).transpose(1, 0, 2)
    mask = (inbound_mask(pixel, h, w) & in_front).astype(rgb_feat.dtype)
    return rgb_feat, mask.transpose(1, 0)


def project_and_gather_quad(xyz, KE, src_quad, feat_quad, h, w, *,
                            neg_ray=False, src_scale=None, feat_scale=None):
    """`project_and_gather` through packed quad tables
    (ops.grid_sample.build_quad_table_2d): one row-gather per (point, view,
    map) instead of four — the per-point projection gather is the demo
    renderer's largest HBM cost. Gathers run in (P, V) row order (no output
    transpose copy — measured 2.9 GB of relayout at the ref-mode 2.62M-point
    frame).

    src_quad: (V, H+1, W+1, 12) float or uint8 (raw pixel bytes — exact,
    since source images are uint8 on disk; `src_scale` then carries the
    1/255 dequant applied after the weighted sum).
    feat_quad: (V, Hf+1, Wf+1, 4C) float or int8 (quantize_image_i8 rows;
    `feat_scale` then carries the per-channel dequant).
    Returns rgb_feat (P, V, 3 + C), mask (P, V)."""
    from gpnerf_tpu.ops.grid_sample import bilinear_quad_nhwc_pv

    pixel, in_front = compute_projections(xyz, KE, neg_ray=neg_ray)
    norm_pix = normalize_pixels(pixel, h, w)
    rgb = bilinear_quad_nhwc_pv(
        src_quad, norm_pix, h, w, scale=src_scale
    )  # (P, V, 3)
    hf = feat_quad.shape[1] - 1
    wf = feat_quad.shape[2] - 1
    feat = bilinear_quad_nhwc_pv(
        feat_quad, norm_pix, hf, wf, scale=feat_scale
    )  # (P, V, C)
    rgb_feat = jnp.concatenate(
        [rgb.astype(feat.dtype), feat], axis=-1
    )
    mask = (inbound_mask(pixel, h, w) & in_front).astype(rgb_feat.dtype)
    return rgb_feat, mask.transpose(1, 0)


def project_and_gather_quad_merged(xyz, KE, srcfeat_quad, h, w, *,
                                   neg_ray=False, scale=None,
                                   out_dtype=None, vp_order=False,
                                   pallas=False):
    """`project_and_gather_quad` through ONE combined [rgb|features] quad
    table: a single row-gather per (point, view) instead of two. The table
    may live at any resolution (features upsampled to source resolution, or
    source rgb downsampled to feature resolution) — the gather uses the
    table's own grid; h/w only define the pixel frame of K for the
    projection/in-bounds math.

    srcfeat_quad: (V, Ht+1, Wt+1, 4*(3+C)); `scale`: per-channel
    dequantization factors when the table is int8-quantized.
    Returns rgb_feat (P, V, 3 + C), mask (P, V)."""
    from gpnerf_tpu.ops.grid_sample import (
        bilinear_quad_nhwc,
        bilinear_quad_nhwc_pv,
        bilinear_quad_nhwc_pv_pallas,
    )

    pixel, in_front = compute_projections(xyz, KE, neg_ray=neg_ray)
    norm_pix = normalize_pixels(pixel, h, w)
    ht = srcfeat_quad.shape[1] - 1
    wt = srcfeat_quad.shape[2] - 1
    if pallas:
        # fused Pallas weighted-sum/dequant, channel-major output (kills
        # the int8 gather-output re-tile copies; ops/pallas_lerp.py)
        rgb_feat = bilinear_quad_nhwc_pv_pallas(
            srcfeat_quad, norm_pix, ht, wt, scale=scale, out_dtype=out_dtype
        )
    elif vp_order:
        # per-view (V, P) gather + float output transpose: with int8 tables
        # the (P, V)-ordered gather's s8 relayout moves 134 MB while this
        # form transposes only the 67 MB float result
        vp = bilinear_quad_nhwc(
            srcfeat_quad, norm_pix, ht, wt, scale=scale, out_dtype=out_dtype
        )  # (V, P, C)
        rgb_feat = vp.transpose(1, 0, 2)
    else:
        # gather emitted directly in (P, V) row order (no transpose copy)
        rgb_feat = bilinear_quad_nhwc_pv(
            srcfeat_quad, norm_pix, ht, wt, scale=scale, out_dtype=out_dtype
        )
    mask = (inbound_mask(pixel, h, w) & in_front).astype(rgb_feat.dtype)
    return rgb_feat, mask.transpose(1, 0)


def project_gather_rows_merged(xyz, KE, srcfeat_quad, h, w, *, neg_ray=False,
                               batched=False):
    """Gather-only half of `project_and_gather_quad_merged` for the fused
    point-stage kernel (ops/pallas_point.py): returns the RAW quad rows in
    view-major order plus the tap weights and view mask — the weighted sum,
    dequantization and everything downstream happen inside the kernel.

    Returns:
      rows: (V*P, 4C) table dtype, view-major (view v at [v*P:(v+1)*P]).
      w4: (V, 4, P) f32 bilinear tap weights with in-bounds folded.
      vmask: (V, P) f32 validity (in-bounds & in-front).
    """
    V = srcfeat_quad.shape[0]
    C4 = srcfeat_quad.shape[-1]
    pixel, in_front = compute_projections(xyz, KE, neg_ray=neg_ray)
    norm_pix = normalize_pixels(pixel, h, w)
    ht = srcfeat_quad.shape[1] - 1
    wt = srcfeat_quad.shape[2] - 1
    from gpnerf_tpu.ops.grid_sample import _unnormalize

    x = _unnormalize(norm_pix[..., 0], wt)
    y = _unnormalize(norm_pix[..., 1], ht)
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx1 = (x - x0).astype(jnp.float32)
    wy1 = (y - y0).astype(jnp.float32)
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    xc = jnp.clip(xi, -1, wt - 1) + 1
    yc = jnp.clip(yi, -1, ht - 1) + 1
    stride = (ht + 1) * (wt + 1)
    if batched:
        # V-batched take_along_axis: XLA places the per-view table
        # operand in VMEM (S(1)) when it fits, which gathers ~2-8 ns/row
        # vs ~13-14 ns/row for the flat HBM form — measured 100 vs 173 ms
        # on the ref-mode 12.58M-row feature gather (trace_demo
        # fusion.20/26, r5). The (V, P, C4) -> (V*P, C4) reshape is a
        # contiguous bitcast. The flat form stays the default: the FAST
        # mode's merged gather measured 6 ms/frame SLOWER batched.
        idx_vp = yc * (wt + 1) + xc  # (V, P)
        rows = jnp.take_along_axis(
            srcfeat_quad.reshape(V, stride, C4), idx_vp[..., None], axis=1
        ).reshape(V * idx_vp.shape[1], C4)
    else:
        voff = jnp.arange(V, dtype=jnp.int32)[:, None] * stride
        idx_vp = yc * (wt + 1) + xc + voff  # (V, P)
        rows = srcfeat_quad.reshape(V * stride, C4)[idx_vp.reshape(-1)]

    def tapw(xi_, yi_, wgt):
        inb = (xi_ >= 0) & (xi_ <= wt - 1) & (yi_ >= 0) & (yi_ <= ht - 1)
        return wgt * inb.astype(jnp.float32)

    w4 = jnp.stack(
        [
            tapw(xi, yi, wx0 * wy0),
            tapw(xi + 1, yi, wx1 * wy0),
            tapw(xi, yi + 1, wx0 * wy1),
            tapw(xi + 1, yi + 1, wx1 * wy1),
        ],
        axis=1,
    )  # (V, 4, P)
    vmask = (inbound_mask(pixel, h, w) & in_front).astype(jnp.float32)
    return rows, w4, vmask


def gather_smpl_features(smpl_xyz, KE, featmaps, h, w, *, neg_ray=False):
    """Per-SMPL-vertex multi-view feature gather
    (`Projector.compute` smpl branch, BaseRender.py:341-346 /
    demo_render.compute_smpl:612-632).

    Args:
      smpl_xyz: (S, 3) posed SMPL vertices in world space.

    Returns:
      smpl_feat: (S, V, C).
    """
    pixel, _ = compute_projections(smpl_xyz, KE, neg_ray=neg_ray)
    norm_pix = normalize_pixels(pixel, h, w)
    feat = grid_sample_2d_nhwc(featmaps, norm_pix)  # (V, S, C)
    return feat.transpose(1, 0, 2)
