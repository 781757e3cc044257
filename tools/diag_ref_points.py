"""Decompose the reference-semantics mode's point-stage cost (VERDICT r4 #8).

The r5 ref-mode roofline ladder (artifacts/roofline_ref_r5.json) puts the
projection gather at 249 ms and the octet query at 171 ms of the 539 ms
frame; this tool isolates each point-stage op on the REAL pipeline's own
arrays so candidate layouts can be measured directly instead of through
full-pipeline recompiles:

  * the frame stage runs once per frame through `jax.jit(_frame_stage)`
    (its (pre, tables, rays) return is a pytree);
  * `_point_stages` is temporarily stubbed to RETURN its (pts_c, dhw_c,
    sig_ok) inputs, so one `_demo_impl` execution hands back the exact
    compacted point set the production program would feed the point stages
    (traced values cannot be captured by a spy — returning them is the only
    exact tap);
  * each candidate is a separate jit timed with the bench's async protocol
    over distinct frames (identical-input elision defeated, dispatch
    round-trips amortized).

Usage: python tools/diag_ref_points.py [n_frames] [dotted.cfg overrides...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF_OVERRIDES = [
    "tpu.tight_cull", "False",
    "tpu.samples_per_ray", "64",
    "tpu.tap_window", "0",
    "tpu.merge_lowres_src", "False",
    "tpu.ray_cap", "57344",
    "tpu.sigma_cap", "2293760",
    "tpu.rgb_cap", "1048576",
]


def main():
    import jax
    import jax.numpy as jnp

    from gpnerf_tpu.config import cfg as _cfg
    from gpnerf_tpu.registry import get
    from gpnerf_tpu.render.demo import Renderer
    from gpnerf_tpu.train.checkpoint import load_eval_model
    from gpnerf_tpu.utils.bench_frames import get_bench_frames

    args = sys.argv[1:]
    # default 4 frames: 6 frames' worth of held tables + (P, V, C) gather
    # outputs at the ref-mode P=4.19M exhausts the 16 GB HBM
    n = int(args[0]) if args and args[0].isdigit() else 4
    if args and args[0].isdigit():
        args = args[1:]

    cfg = _cfg.clone()
    cfg.defrost()
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg.merge_from_file(os.path.join(root, "configs", "synthetic.yaml"))
    cfg.dataset.H = 512
    cfg.dataset.W = 512
    cfg.dataset.ratio = 1.0
    cfg.head.sigma.code_dim = 32
    cfg.render.file = "demo_render"
    cfg.device = "tpu"
    cfg.merge_from_list(REF_OVERRIDES + list(args))
    cfg.freeze()

    host = get_bench_frames(cfg, n)
    render = get("render", cfg.render.file)(cfg)
    variables = render.init_variables(0, host[0])
    variables = load_eval_model(
        os.path.join(root, "artifacts", "bench_ckpt.pth"), variables,
        cfg.head.sigma.n_layers,
    )
    dev = [{k: jnp.asarray(v) for k, v in b.items()} for b in host]
    enc = jax.jit(render.encode_fn())
    feats = [enc(variables, b["src_imgs"]) for b in dev]

    # 1) real tables per frame
    fs = jax.jit(render._frame_stage)
    frames = [fs(variables, b, f) for b, f in zip(dev, feats)]
    jax.block_until_ready(frames[-1])

    # 2) exact compacted point sets: stub _point_stages to return its inputs
    orig = Renderer._point_stages

    def stub(self, apply, batch, pre, tables, pts_c, dhw_c, sig_ok,
             sig_idx_t, *a, **k):
        return (
            {"pts_c": pts_c, "dhw_c": dhw_c,
             "sig_ok": sig_ok.astype(jnp.float32)},
            None,
        )

    Renderer._point_stages = stub
    try:
        tap = jax.jit(render._demo_impl)
        pt_sets = [tap(variables, b, f) for b, f in zip(dev, feats)]
        jax.block_until_ready(pt_sets[-1])
    finally:
        Renderer._point_stages = orig

    P = pt_sets[0]["pts_c"].shape[0]
    print(f"# P = {P} compacted points/frame, {n} frames", flush=True)
    head_vars = variables["head"]

    # blanket splat demand (sizes cfg.tpu.splat_cap): occupied voxels of
    # the sum-over-levels field per frame
    def occ_count(variables, batch, featmaps):
        sp = render.splat_cap
        render.splat_cap = 0
        try:
            from gpnerf_tpu.models.sparse_net import occupancy_volume
            pre = render.prepare_frame(
                batch, featmaps, neg_ray=render.neg_ray_val
            )
            level_feats = render.nerfhead.apply(
                head_vars, pre["smpl_feat"], pre["vertex_rows"],
                pre["grids"],
                method=lambda m, *a: m.volume(*a, train=False),
            )
            m3 = occupancy_volume(level_feats, pre["grids"])
            return (m3 > render.occupancy_threshold).sum()
        finally:
            render.splat_cap = sp

    counts = [
        int(jax.jit(occ_count)(variables, b, f))
        for b, f in zip(dev, feats)
    ]
    print(f"# blanket occupied voxels/frame: max {max(counts)} "
          f"{counts}", flush=True)

    def timeit(name, fn, inputs, reps=2):
        outs = [fn(*i) for i in inputs]
        jax.block_until_ready(outs)  # compile + warm
        best = None
        for _ in range(reps):
            t0 = time.time()
            outs = [fn(*i) for i in inputs]
            jax.block_until_ready(outs)
            dt = (time.time() - t0) / len(inputs) * 1e3
            best = dt if best is None else min(best, dt)
        print(f"{name:34s} {best:8.2f} ms/frame", flush=True)
        return best

    head_vars = variables["head"]
    out_sh = frames[0][0]["out_sh"]  # static across frames (max_out_sh pad)
    results = {}

    # table metadata comes back from the jitted _frame_stage as device
    # scalars; jit args flatten NamedTuple fields into tracers, so rebuild
    # the tables inside the closures with HOST-static ints and pass only
    # the rows arrays
    from gpnerf_tpu.ops.grid_sample import FlatOctetTable, NearestTable

    t1 = frames[0][1]["octet_vols"][0]
    tc = frames[0][1]["octet_vols"][1]
    t1_shape = tuple(int(v) for v in np.asarray(t1.shape))
    tc_meta = (
        tuple(int(v) for v in np.asarray(tc.shape)),
        int(tc.div), int(tc.interleave), int(tc.lerp_axes),
    ) if isinstance(tc, NearestTable) else None

    def rebuild(l1_rows, c_rows):
        octl1 = FlatOctetTable(l1_rows, t1_shape)
        if tc_meta is None:
            octc = c_rows
        else:
            octc = NearestTable(c_rows, *tc_meta)
        return octl1, octc

    # --- octet multi-scale query (sigma_q ladder stage) ---
    def octet_q(l1_rows, c_rows, scales, dhw):
        octl1, octc = rebuild(l1_rows, c_rows)
        return render.nerfhead.apply(
            head_vars, octl1, octc, dhw, out_sh, scales=scales,
            method=lambda m, *a, **k:
                m.sigmahead.query_sigma_feat_octet_folded(*a, **k),
        )

    oct_in = [
        (fr[1]["octet_vols"][0].rows, fr[1]["octet_vols"][1].rows,
         fr[1]["octet_scales"], ps["dhw_c"])
        for fr, ps in zip(frames, pt_sets)
    ]
    results["octet_query"] = timeit("octet query (folded)", jax.jit(octet_q),
                                    oct_in)

    # gather-only pieces of the octet query
    def octet_l1_gather(l1_rows, dhw):
        from gpnerf_tpu.ops.grid_sample import trilinear_octet_rows
        octl1 = FlatOctetTable(l1_rows, t1_shape)
        frac = dhw / out_sh.astype(dhw.dtype)
        size = out_sh // 2
        pos = frac * (size - 1).astype(dhw.dtype)
        return trilinear_octet_rows(octl1, pos, size)

    results["octet_l1_only"] = timeit(
        "  l1 octet trilerp only", jax.jit(octet_l1_gather),
        [(fr[1]["octet_vols"][0].rows, ps["dhw_c"])
         for fr, ps in zip(frames, pt_sets)],
    )

    def coarse_gather(c_rows, dhw):
        from gpnerf_tpu.ops.grid_sample import nearest_rows
        octc = NearestTable(c_rows, *tc_meta)
        frac = dhw / out_sh.astype(dhw.dtype)
        size = out_sh // octc.div
        if octc.interleave > 1:
            size = octc.interleave * (size - 1) + 1
        pos = frac * (size - 1).astype(dhw.dtype)
        return nearest_rows(octc, pos, size)

    results["coarse_nearest_only"] = timeit(
        "  coarse nearest rows only", jax.jit(coarse_gather),
        [(fr[1]["octet_vols"][1].rows, ps["dhw_c"])
         for fr, ps in zip(frames, pt_sets)],
    )

    # --- projection gather (cull ladder stage tail) ---
    Hs, Ws = host[0]["src_imgs"].shape[1:3]
    neg = render.neg_ray_val

    def proj_current(pts, KE, sq, fq, ss):
        from gpnerf_tpu.ops.projection import project_and_gather_quad
        return project_and_gather_quad(
            pts, KE, sq, fq, Hs, Ws, neg_ray=neg, src_scale=ss
        )

    proj_in = [
        (ps["pts_c"], fr[0]["KE"], fr[1]["src_quad"], fr[1]["feat_quad"],
         fr[1]["src_scale"])
        for fr, ps in zip(frames, pt_sets)
    ]
    results["proj_quad_current"] = timeit(
        "proj gather quad (current VP+T)", jax.jit(proj_current), proj_in)

    def proj_split_rgb(pts, KE, sq, ss):
        from gpnerf_tpu.ops.grid_sample import bilinear_quad_nhwc_pv
        from gpnerf_tpu.ops.projection import (
            compute_projections, normalize_pixels,
        )
        pixel, _ = compute_projections(pts, KE, neg_ray=neg)
        np_ = normalize_pixels(pixel, Hs, Ws)
        return bilinear_quad_nhwc_pv(sq, np_, Hs, Ws, scale=ss)

    results["proj_rgb_only"] = timeit(
        "  src rgb quad only", jax.jit(proj_split_rgb),
        [(ps["pts_c"], fr[0]["KE"], fr[1]["src_quad"], fr[1]["src_scale"])
         for fr, ps in zip(frames, pt_sets)],
    )

    def proj_split_feat(pts, KE, fq):
        from gpnerf_tpu.ops.grid_sample import bilinear_quad_nhwc_pv
        from gpnerf_tpu.ops.projection import (
            compute_projections, normalize_pixels,
        )
        pixel, _ = compute_projections(pts, KE, neg_ray=neg)
        np_ = normalize_pixels(pixel, Hs, Ws)
        return bilinear_quad_nhwc_pv(
            fq, np_, fq.shape[1] - 1, fq.shape[2] - 1
        )

    results["proj_feat_only"] = timeit(
        "  feat quad only", jax.jit(proj_split_feat),
        [(ps["pts_c"], fr[0]["KE"], fr[1]["feat_quad"])
         for fr, ps in zip(frames, pt_sets)],
    )

    # --- heads on the gathered features (meanvar+sigma+rgb ladder) ---
    def heads(rgb_feat, mask, l1_rows, c_rows, scales, dhw, sig_ok):
        from gpnerf_tpu.models.heads import fused_mean_variance
        octl1, octc = rebuild(l1_rows, c_rows)
        sigma_feat = render.nerfhead.apply(
            head_vars, octl1, octc, dhw, out_sh, scales=scales,
            method=lambda m, *a, **k:
                m.sigmahead.query_sigma_feat_octet_folded(*a, **k),
        )
        mean, var = fused_mean_variance(rgb_feat)
        nvo = mask.astype(jnp.float32).sum(axis=-1, keepdims=True)
        sigma = render.nerfhead.apply(
            head_vars, sigma_feat, mean[:, 0], var[:, 0], nvo,
            method=lambda m, *a: m.rgbhead.density(*a),
        )[:, 0]
        sigma = jnp.where(sig_ok > 0, sigma.astype(jnp.float32), 0.0)
        rgb = render.nerfhead.apply(
            head_vars, rgb_feat[:, None], mean[:, None], var[:, None],
            method=lambda m, *a: m.rgbhead.color(*a),
        )[:, 0]
        return sigma, rgb

    pg = jax.jit(proj_current)
    rgbfeats = [pg(*i) for i in proj_in]
    jax.block_until_ready(rgbfeats[-1])
    results["heads_op_by_op"] = timeit(
        "heads (meanvar+density+color)", jax.jit(heads),
        [
            (rf[0], rf[1], fr[1]["octet_vols"][0].rows,
             fr[1]["octet_vols"][1].rows,
             fr[1]["octet_scales"], ps["dhw_c"], ps["sig_ok"])
            for rf, fr, ps in zip(rgbfeats, frames, pt_sets)
        ],
    )

    print(json.dumps({"P": int(P), "ms": results}), flush=True)


if __name__ == "__main__":
    main()
