"""Training-step benchmark: measures compiled step time and a short loss
curve for a given `tpu.train_dtype`, on the real device.

Completes VERDICT r3 #4's measurement: run once with `tpu.train_dtype
float32` and once with `bfloat16` and compare step time + loss trajectories
(reference budget context: 500 iters x 1000 epochs,
/root/reference/configs/default.py:104-113; eager loop
BaseTrainer.py:117-135).

Usage:
    python tools/train_bench.py [--iters N] [cfg overrides...]
Prints one JSON line: {"dtype", "iters", "s_per_it", "first_loss",
"last10_mean_loss", "losses": [...]}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("opts", nargs=argparse.REMAINDER)
    args = ap.parse_args()

    from gpnerf_tpu.config import cfg as _cfg

    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.head.sigma.code_dim = 32
    if args.opts:
        cfg.merge_from_list(args.opts)
    cfg.freeze()

    from gpnerf_tpu.utils.platform import select_platform

    select_platform(cfg.device)

    import jax
    import jax.numpy as jnp

    from gpnerf_tpu.registry import get
    from gpnerf_tpu.train.step import (
        make_optimizer,
        make_train_step,
        split_variables,
    )

    np.random.seed(0)
    ds = get("dataset", cfg.dataset.train.file)(cfg, is_train=True)
    render = get("render", "BaseRender")(cfg)
    criterion = get("criterion", cfg.train.criterion_file)(cfg)
    optimizer, _ = make_optimizer(cfg)

    batches = [ds[i % len(ds)] for i in range(8)]
    dev_batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in batches
    ]
    variables = render.init_variables(0, batches[0])
    params, batch_stats = split_variables(variables)
    opt_state = optimizer.init(params)
    step = make_train_step(render, criterion, optimizer)

    rng = jax.random.PRNGKey(cfg.seed)
    # compile (excluded from timing)
    rng, k = jax.random.split(rng)
    p2, bs2, os2, m = step(params, batch_stats, opt_state, dev_batches[0], k)
    jax.block_until_ready(m["loss"])
    # donated buffers: continue from the compiled step's outputs
    params, batch_stats, opt_state = p2, bs2, os2

    losses = []
    t0 = time.time()
    metrics = []
    for i in range(args.iters):
        rng, k = jax.random.split(rng)
        params, batch_stats, opt_state, m = step(
            params, batch_stats, opt_state, dev_batches[i % len(dev_batches)], k
        )
        metrics.append(m["loss"])
    jax.block_until_ready(metrics[-1])
    dt = time.time() - t0
    losses = [float(x) for x in metrics]

    out = {
        "dtype": cfg.tpu.train_dtype,
        "device": jax.devices()[0].device_kind,
        "iters": args.iters,
        "s_per_it": round(dt / args.iters, 4),
        "first_loss": round(losses[0], 5),
        "last10_mean_loss": round(float(np.mean(losses[-10:])), 5),
        "losses": [round(x, 5) for x in losses],
    }
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
