"""Benchmark: 512x512 progressive full-image rendering, frames/sec/chip.

Mirrors the reference's only speed harness — `Trainer.evaluate` averaging
per-frame render time of the demo renderer at 512x512
(/root/reference/libs/trainers/BaseTrainer.py:276-280; protocol
BASELINE.md) — on the synthetic fixture scene (ZJU-MoCap is not present in
this environment; geometry/ray statistics are body-like by construction).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with
vs_baseline = fps / 20 (the >=20 fps north star, BASELINE.json).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from gpnerf_tpu.config import cfg as _cfg
    from gpnerf_tpu.registry import get

    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    # flagship eval protocol: 512x512, code_dim 32, demo renderer
    cfg.dataset.H = 512
    cfg.dataset.W = 512
    cfg.dataset.ratio = 1.0
    cfg.head.sigma.code_dim = 32
    cfg.render.file = "demo_render"
    cfg.device = "tpu"
    cfg.freeze()

    np.random.seed(0)
    ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    render = get("render", cfg.render.file)(cfg)

    # host-side batch prep (excluded from timing, like the reference's
    # DataLoader workers)
    n_frames = 10
    host_batches = [ds[i] for i in range(n_frames)]

    variables = render.init_variables(jax.random.PRNGKey(0), host_batches[0])

    import os

    ckpt_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "artifacts", "bench_ckpt.pth")
    if os.path.exists(ckpt_path):
        # trained weights: realistic occupancy field -> realistic culling
        from gpnerf_tpu.train.checkpoint import load_eval_model

        variables = load_eval_model(ckpt_path, variables, cfg.head.sigma.n_layers)
        print(f"# loaded {ckpt_path}", file=sys.stderr)
    else:
        # warm BatchNorm running statistics so eval-mode activations (and
        # the occupancy culling) behave like a trained model's
        batch0 = {k: jnp.asarray(v) for k, v in host_batches[0].items()}
        featmaps = render.encoder.apply(variables["encoder"], batch0["src_imgs"])
        pre = render.prepare_frame(batch0, featmaps)
        warm = jax.jit(
            lambda hv: render.nerfhead.apply(
                hv,
                pre["smpl_feat"],
                pre["vertex_rows"],
                pre["grids"],
                train=True,
                method=lambda m, *a, **k: m.volume(*a, **k),
                mutable=["batch_stats"],
            )[1]
        )
        hv = variables["head"]
        for _ in range(25):
            hv = {"params": hv["params"], **warm(hv)}
        variables = {"encoder": variables["encoder"], "head": hv}

    fn = render.render_demo_fn()
    dev_batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in host_batches
    ]

    # compile + 2 warmup renders
    ret = jax.block_until_ready(fn(variables, dev_batches[0]))
    jax.block_until_ready(fn(variables, dev_batches[1 % n_frames]))
    overflows = np.asarray(ret["overflows"]).tolist()

    t0 = time.time()
    for b in dev_batches:
        ret = fn(variables, b)
    jax.block_until_ready(ret)
    dt = time.time() - t0
    fps = n_frames / dt

    print(
        json.dumps(
            {
                "metric": "synthetic-body 512x512 progressive render",
                "value": round(fps, 3),
                "unit": "frames/sec/chip",
                "vs_baseline": round(fps / 20.0, 3),
            }
        )
    )
    print(
        f"# {dt / n_frames * 1000:.1f} ms/frame; overflows(ray,perrayK,sigma,rgb)={overflows}; "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
