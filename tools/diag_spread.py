"""Root-cause the bench's per-frame completion-stamp spread (VERDICT r4 #3).

bench.py's async-loop protocol dispatches all 10 frames without blocking and
stamps each frame's completion by blocking on them in order; the diffs of
those stamps printed as "per-frame min/med/max" swing 22-71 ms while the
compiled program is static-shape (identical shapes should cost identical
device time). Two hypotheses:

  (a) device-side stalls: some frames genuinely execute slower;
  (b) protocol artifact: the stamps are HOST-observed through the networked
      axon runtime, where every block_until_ready is a tunnel round-trip —
      stamp diffs then measure RTT jitter + host scheduling, not device time.

Discriminating measurement: per-frame DEVICE time via scan isolation — the
jitted lax.scan program (render_demo_scan_fn) is called with order=[i]*C,
executing frame i C times sequentially ON DEVICE in one dispatch. One
dispatch per frame means the tunnel round-trip amortizes over C device-side
executions; `order` is a traced operand, so all 10 measurements share one
compiled program (no recompiles, no dispatch-path variance between frames).
Within-program repeats are real executions (the runtime's identical-input
elision is dispatch-level), and the scan body's gather/scatter work depends
on the frame data, so nothing degenerates.

If the scan-isolated per-frame times are flat (max/min < 1.3x) while the
async stamp diffs still swing 2-3x on the same frames in the same session,
hypothesis (b) is proven and the stamp spread is a measurement artifact of
the host/tunnel path, not a device stall.

Usage: python tools/diag_spread.py [reps_per_frame]
"""

from __future__ import annotations

import json
import os
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
    from gpnerf_tpu.utils.bench_frames import get_bench_frames

    cycles = int(sys.argv[1]) if len(sys.argv) > 1 else 10

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
    cfg.freeze()

    n_frames = 10
    host_batches = get_bench_frames(cfg, n_frames)
    render = get("render", cfg.render.file)(cfg)
    variables = render.init_variables(0, host_batches[0])
    variables = load_eval_model(
        os.path.join(root, "artifacts", "bench_ckpt.pth"), variables,
        cfg.head.sigma.n_layers,
    )
    dev = [{k: jnp.asarray(v) for k, v in b.items()} for b in host_batches]
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *dev)

    sfn = render.render_demo_scan_fn()
    order0 = jnp.zeros((cycles,), jnp.int32)
    jax.block_until_ready(sfn(variables, stacked, order0))  # compile once

    # 1) scan-isolated DEVICE time per frame: order=[i]*cycles, one dispatch
    per_frame_dev = []
    for i in range(n_frames):
        order = jnp.full((cycles,), i, jnp.int32)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(sfn(variables, stacked, order))
            dt = (time.perf_counter() - t0) / cycles * 1e3
            best = dt if best is None else min(best, dt)
        per_frame_dev.append(round(best, 2))

    # 2) the bench's async completion-stamp protocol, same session
    fn = render.render_demo_fn()
    jax.block_until_ready(fn(variables, dev[0]))
    jax.block_until_ready(fn(variables, dev[1]))
    stamp_runs = []
    for _ in range(3):
        t0 = time.perf_counter()
        rets = [fn(variables, b) for b in dev]
        stamps = []
        for r in rets:
            jax.block_until_ready(r["overflows"])
            stamps.append(time.perf_counter() - t0)
        stamp_runs.append(
            [round(float(d), 2) for d in np.diff([0.0] + stamps) * 1e3]
        )

    # 3) fully-synchronous per-frame loop (block each): device + 1 RTT each
    sync_ms = []
    for b in dev:
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(variables, b))
            dt = (time.perf_counter() - t0) * 1e3
            best = dt if best is None else min(best, dt)
        sync_ms.append(round(best, 2))

    dev_arr = np.array(per_frame_dev)
    out = {
        "scan_isolated_device_ms_per_frame": per_frame_dev,
        "device_spread_ratio": round(float(dev_arr.max() / dev_arr.min()), 3),
        "async_stamp_diffs_ms": stamp_runs,
        "stamp_spread_ratio": [
            round(max(r) / min(r), 2) for r in stamp_runs
        ],
        "sync_blocking_ms_per_frame": sync_ms,
        "device": jax.devices()[0].device_kind,
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
