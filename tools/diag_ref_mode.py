"""Per-pixel diagnosis of the reference-cull-semantics quality gap
(VERDICT r3 #3).

Renders the same frames through (a) the tight-cull pipeline at K=64
drop-free and (b) reference-cull semantics (masks3d sum-over-levels
blanket, all rays, all samples — demo_render.py:270-283), and decomposes
each frame's squared error into:
  * pixels covered by BOTH modes (same rays, different sample culls),
  * pixels covered ONLY by the ref blanket (extra rays the loose splat
    admits — fringe/fog pixels the tight mode leaves background),
  * pixels covered by NEITHER (background, identical).

If the gap lives in the ref-only band, the reproduction is faithful and
the reference's own loose blanket is what costs the dB (it renders faint
fog over near-background pixels that the dataset GT masks to 0); if it
lives in the shared band, our sample-cull semantics deviate.

Usage: python tools/diag_ref_mode.py [n_frames]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax.numpy as jnp

    from gpnerf_tpu.config import cfg as _cfg
    from gpnerf_tpu.registry import get
    from gpnerf_tpu.render.demo import pred_img_hwc
    from gpnerf_tpu.train.checkpoint import load_eval_model
    from gpnerf_tpu.utils.bench_frames import get_bench_frames

    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 4

    def mode_cfg(ref):
        cfg = _cfg.clone()
        cfg.defrost()
        cfg.merge_from_file("configs/synthetic.yaml")
        cfg.dataset.H = 512
        cfg.dataset.W = 512
        cfg.dataset.ratio = 1.0
        cfg.head.sigma.code_dim = 32
        cfg.render.file = "demo_render"
        cfg.device = "tpu"
        cfg.tpu.samples_per_ray = 64
        cfg.tpu.sigma_cap = 2621440
        if ref:
            cfg.tpu.tight_cull = False
            cfg.tpu.tap_window = 0
            cfg.tpu.merge_lowres_src = False
            cfg.tpu.ray_cap = 65536
            cfg.tpu.rgb_cap = 1048576
        cfg.freeze()
        return cfg

    cfg_t = mode_cfg(ref=False)
    cfg_r = mode_cfg(ref=True)
    host = get_bench_frames(cfg_t, n_frames)

    import jax

    rows = []
    for name, cfg in (("tight_k64", cfg_t), ("ref", cfg_r)):
        render = get("render", "demo_render")(cfg)
        variables = render.init_variables(0, host[0])
        variables = load_eval_model(
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), "artifacts", "bench_ckpt.pth"),
            variables, cfg.head.sigma.n_layers,
        )
        fn = render.render_demo_fn()
        outs = []
        for b in host:
            ret = fn(variables, {k: jnp.asarray(v) for k, v in b.items()})
            outs.append(
                (pred_img_hwc(ret),
                 np.asarray(ret["mask_at_box"]).reshape(512, 512))
            )
        rows.append(outs)

    (tight_outs, ref_outs) = rows
    agg = {k: [] for k in ("both", "ref_only", "tight_only")}
    for i, b in enumerate(host):
        gt = np.asarray(b["tar_img"], np.float32)
        if gt.max() > 1.5:
            gt = gt / 255.0
        mab = np.asarray(b["mask_at_box"]).reshape(512, 512)
        gt = gt * mab[..., None]  # evaluator masks background
        ti, tm = tight_outs[i]
        ri, rm = ref_outs[i]
        tm = tm & mab
        rm = rm & mab
        bands = {
            "both": tm & rm,
            "ref_only": rm & ~tm,
            "tight_only": tm & ~rm,
        }
        err_t = ((ti - gt) ** 2).sum(-1)
        err_r = ((ri - gt) ** 2).sum(-1)
        line = {"frame": i}
        for k, m in bands.items():
            n = int(m.sum())
            line[k] = {
                "px": n,
                "mse_tight": float(err_t[m].mean()) if n else 0.0,
                "mse_ref": float(err_r[m].mean()) if n else 0.0,
                # total squared error the band contributes per mode
                "sse_tight": float(err_t[m].sum()),
                "sse_ref": float(err_r[m].sum()),
            }
            agg[k].append((line[k]["sse_tight"], line[k]["sse_ref"], n))
        print(json.dumps(line))
    tot = {
        k: {
            "px": int(sum(n for _, _, n in v)),
            "sse_tight": round(sum(a for a, _, _ in v), 3),
            "sse_ref": round(sum(b for _, b, _ in v), 3),
        }
        for k, v in agg.items()
    }
    print(json.dumps({"total": tot}))


if __name__ == "__main__":
    main()
