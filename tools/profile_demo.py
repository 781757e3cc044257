"""Stage-prefix profiler for the progressive renderer (run on TPU).

Uses the renderer's own `stop_stage` hook so the profiled code is exactly
the production pipeline. Optionally loads a trained checkpoint (realistic
occupancy); otherwise warms BatchNorm statistics first — on this runtime,
cold (empty-occupancy) measurements are meaningless because degenerate
gather/scatter index patterns execute much faster than real ones.

Usage: python tools/profile_demo.py [ckpt.pth]
"""

import sys
import time
from functools import partial

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.registry import get


def main():
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "artifacts/bench_ckpt.pth"
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
    frames = [ds[i] for i in range(4)]
    variables = render.init_variables(jax.random.PRNGKey(0), frames[0])

    import os

    if os.path.exists(ckpt):
        from gpnerf_tpu.train.checkpoint import load_eval_model

        variables = load_eval_model(ckpt, variables, cfg.head.sigma.n_layers)
    else:
        batch0 = {k: jnp.asarray(v) for k, v in frames[0].items()}
        featmaps = render.encoder.apply(variables["encoder"], batch0["src_imgs"])
        pre = render.prepare_frame(batch0, featmaps)
        warm = jax.jit(
            lambda hv: render.nerfhead.apply(
                hv, pre["smpl_feat"], pre["vertex_rows"], pre["grids"],
                train=True, method=lambda m, *a, **k: m.volume(*a, **k),
                mutable=["batch_stats"],
            )[1]
        )
        hv = variables["head"]
        for _ in range(25):
            hv = {"params": hv["params"], **warm(hv)}
        variables = {"encoder": variables["encoder"], "head": hv}

    dev = [{k: jnp.asarray(v) for k, v in b.items()} for b in frames]
    prev = 0.0
    for stage in ("volume", "rays", "cull_occ", "cull_compact", "cull", "sigma", None):
        fn = jax.jit(partial(render._demo_impl, stop_stage=stage))
        jax.block_until_ready(fn(variables, dev[0]))
        ts = []
        for b in dev:
            t0 = time.time()
            jax.block_until_ready(fn(variables, b))
            ts.append(time.time() - t0)
        t = min(ts)
        print(f"{str(stage):8s} total {t * 1000:7.1f} ms  delta {(t - prev) * 1000:7.1f} ms")
        prev = t


if __name__ == "__main__":
    main()
