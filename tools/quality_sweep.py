"""Full-test-set quality sweep for the progressive renderer.

Renders EVERY item of the synthetic test set at 512x512 with the trained
checkpoint (the bench protocol) and reports per-frame + mean PSNR/SSIM and
overflow counters. Used to validate speed-mode deviations (tight_cull,
samples_per_ray, tap_window, sigma_cap) against full-set quality — the
evidence VERDICT r2 asked to publish per overflowing frame.

Usage:
    python tools/quality_sweep.py [dotted.cfg overrides ...]
e.g.
    python tools/quality_sweep.py tpu.tap_window 32
    python tools/quality_sweep.py tpu.sigma_cap 524288

Per-item RNGs are seeded with the item index so every mode renders the
identical (frame, view) list.
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpnerf_tpu.config import cfg as _cfg
    from gpnerf_tpu.registry import get
    from gpnerf_tpu.train.checkpoint import load_eval_model
    from gpnerf_tpu.train.evaluator import Evaluator

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
    if len(sys.argv) > 1:
        cfg.merge_from_list(sys.argv[1:])
    cfg.freeze()

    # full-set frames through the disk cache (same per-index seeding
    # protocol as before: stride 1, seed == index)
    from gpnerf_tpu.utils.bench_frames import get_bench_frames

    frames = get_bench_frames(cfg, n_frames=None)
    render = get("render", cfg.render.file)(cfg)
    b0 = frames[0]
    variables = render.init_variables(0, b0)
    ckpt = os.path.join(root, "artifacts", "bench_ckpt.pth")
    variables = load_eval_model(ckpt, variables, cfg.head.sigma.n_layers)

    is_demo = hasattr(render, "render_demo_fn")
    fn = render.render_demo_fn() if is_demo else render.render_eval_fn()
    ev = Evaluator(cfg, "sweep")
    rows = []
    t_start = time.time()
    for i, b in enumerate(frames):
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        ret = jax.block_until_ready(fn(variables, batch))
        if is_demo:
            from gpnerf_tpu.render.demo import pred_img_hwc

            ev.evaluate({"pred_img": pred_img_hwc(ret)}, b)
        else:
            ev.evaluate({"rgb_map": np.asarray(ret["rgb_map"])}, b)
        rows.append(
            {
                "i": i,
                "psnr": round(float(ev.psnr[-1]), 4),
                "ssim": round(float(ev.ssim[-1]), 5),
                "overflows": np.asarray(
                    ret.get("overflows", np.zeros(4, np.int32))
                ).tolist(),
                "counts": np.asarray(
                    ret.get("counts", np.zeros(3, np.int32))
                ).tolist(),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(
        json.dumps(
            {
                "n": len(rows),
                "psnr_mean": round(float(np.mean(ev.psnr)), 4),
                "ssim_mean": round(float(np.mean(ev.ssim)), 5),
                "psnr_min": round(float(np.min(ev.psnr)), 4),
                "max_overflows": np.max(
                    [r["overflows"] for r in rows], axis=0
                ).tolist(),
                "wall_s": round(time.time() - t_start, 1),
                "overrides": sys.argv[1:],
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
