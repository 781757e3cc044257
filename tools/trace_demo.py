"""Capture a jax.profiler trace of the fused progressive render and print
per-op device time, aggregated by HLO op name.

The async stage profiler (profile_demo.py --async) bounds stage costs but
its deltas are DCE-contaminated; a device trace attributes the frame time
op-by-op. Parses the raw .xplane.pb with tensorflow's bundled proto (the
tensorboard profile plugin is broken in this environment).

Usage: python tools/trace_demo.py [ckpt.pth] [n_top]
"""

import glob
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.registry import get


def capture(trace_dir):
    ckpt = sys.argv[1] if len(sys.argv) > 1 else "artifacts/bench_ckpt.pth"
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.dataset.H = 512
    cfg.dataset.W = 512
    cfg.dataset.ratio = 1.0
    cfg.head.sigma.code_dim = 32
    cfg.render.file = "demo_render"
    if len(sys.argv) > 3:  # trailing dotted overrides: trace_demo.py ckpt 40 k v ...
        cfg.merge_from_list(sys.argv[3:])
    cfg.freeze()

    render = get("render", cfg.render.file)(cfg)
    from gpnerf_tpu.utils.bench_frames import get_bench_frames

    frames = get_bench_frames(cfg, 8)
    variables = render.init_variables(0, frames[0])
    if os.path.exists(ckpt):
        from gpnerf_tpu.train.checkpoint import load_eval_model

        variables = load_eval_model(ckpt, variables, cfg.head.sigma.n_layers)
    dev = [{k: jnp.asarray(v) for k, v in b.items()} for b in frames]

    run = render.render_demo_fn()
    jax.block_until_ready(run(variables, dev[0]))  # compile outside trace
    jax.block_until_ready(run(variables, dev[1]))
    with jax.profiler.trace(trace_dir):
        outs = [run(variables, b) for b in dev]
        jax.block_until_ready(outs[-1])
        jax.block_until_ready(outs)
    print(f"# traced {len(dev)} frames", file=sys.stderr)


def parse(trace_dir, n_top=40, n_frames=8):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        print("no xplane.pb found under", trace_dir)
        return
    space = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        space.ParseFromString(f.read())
    for plane in space.planes:
        if not plane.name.startswith("/device:TPU"):
            continue
        meta = {m.id: m.name for m in plane.event_metadata.values()}
        total = defaultdict(float)
        count = defaultdict(int)
        for line in plane.lines:
            # ONLY the 'XLA Ops' line: it tiles the module exactly (busy ==
            # module time); 'Async XLA Ops' double-counts overlapping
            # copy/slice-start windows (227 ms/frame apparent vs 72 real)
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = meta.get(ev.metadata_id, str(ev.metadata_id))
                total[name] += ev.duration_ps / 1e9  # ms
                count[name] += 1
        if not total:
            continue
        print(f"== plane: {plane.name} (per-frame ms over {n_frames} frames)")
        items = sorted(total.items(), key=lambda kv: -kv[1])
        acc = 0.0
        grand = sum(total.values())
        for name, ms in items[:n_top]:
            acc += ms
            print(
                f"{ms / n_frames:8.3f} ms  x{count[name] // n_frames:<4d}"
                f" {name[:110]}"
            )
        tail = items[n_top:]
        tail_ms = sum(ms for _, ms in tail)
        tail_n = sum(count[name] for name, _ in tail)
        print(
            f"   total {grand / n_frames:.1f} ms/frame; top-{n_top} covers "
            f"{acc / max(grand, 1e-9) * 100:.0f}%; tail {len(tail)} op kinds"
            f" x{tail_n // n_frames} execs = {tail_ms / n_frames:.1f} ms"
        )
        print("   -- tail top 20 --")
        for name, ms in tail[:20]:
            print(f"{ms / n_frames:8.3f} ms  x{count[name] // n_frames:<4d}"
                  f" {name[:110]}")


if __name__ == "__main__":
    n_top = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    trace_dir = "/tmp/jax_trace_demo"
    import shutil

    if os.environ.get("TRACE_PARSE_ONLY", "0") != "1":
        shutil.rmtree(trace_dir, ignore_errors=True)
        os.makedirs(trace_dir, exist_ok=True)
        capture(trace_dir)
        time.sleep(2)
    parse(trace_dir, n_top)
