"""HBM bandwidth roofline for the progressive renderer (VERDICT r4 #2).

For every stage prefix of the production pipeline (the honest stop_stage
ladder with running-checksum DCE anchors, render/demo.py), this tool
reports the stage's

  * wall time (async over distinct bench frames, the profile_demo --async
    protocol — per-call dispatch round-trips amortize, distinct inputs
    defeat the runtime's identical-execution elision),
  * HBM bytes accessed and FLOPs from XLA's OWN cost analysis of the
    compiled executable (post-fusion optimized HLO — the compiler's count
    of operand + output bytes per fused op, not a hand model),
  * achieved GB/s and TFLOP/s per stage delta, as a fraction of the chip
    peak (v5e: 819 GB/s HBM, 197 bf16 TFLOP/s),

so "we are gather-bound" becomes a measurement: a stage running at X% of
the bandwidth roofline has (100-X)% headroom, and a stage near the roof
can only get faster by moving fewer bytes. Reference evidence standard:
the per-stage harness of demo_render.py:97-357.

Caveats recorded with the numbers:
  * the ladder runs the op-by-op point stages (pallas_point prefixes fall
    back; profile() docstring) — the production fused program is measured
    separately at the end; XLA cost analysis does not see inside the
    Pallas kernel (its custom-call counts operand/result bytes only).
  * stop-stage programs each pay the ~0.5 ms checksum anchor the full
    program does not.

Usage: python tools/roofline.py [--json out.json] [dotted.cfg overrides...]
"""

from __future__ import annotations

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PEAK_GBPS = 819.0  # v5e HBM bandwidth
PEAK_TFLOPS = 197.0  # v5e bf16

STAGES = ("pre", "codes", "fuse", "occv", "volume", "rays", "cull_occ",
          "cull_slots", "cull_compact", "cull", "sigma_q", "meanvar",
          "sigma", "rgb", None)


def main():
    import jax
    import jax.numpy as jnp

    from gpnerf_tpu.config import cfg as _cfg
    from gpnerf_tpu.registry import get
    from gpnerf_tpu.train.checkpoint import load_eval_model
    from gpnerf_tpu.utils.bench_frames import get_bench_frames

    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]

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
    if args:
        cfg.merge_from_list(args)
    cfg.freeze()

    n = 8
    host = get_bench_frames(cfg, n)
    render = get("render", cfg.render.file)(cfg)
    variables = render.init_variables(0, host[0])
    variables = load_eval_model(
        os.path.join(root, "artifacts", "bench_ckpt.pth"), variables,
        cfg.head.sigma.n_layers,
    )
    dev = [{k: jnp.asarray(v) for k, v in b.items()} for b in host]
    enc = render.encode_fn()
    featdev = [enc(variables, b["src_imgs"]) for b in dev]
    jax.block_until_ready(featdev[-1])

    def time_async(fn, inputs):
        jax.block_until_ready(fn(*inputs[0]))
        jax.block_until_ready(fn(*inputs[1 % len(inputs)]))
        best = None
        for _ in range(2):
            t0 = time.time()
            outs = [fn(*inp) for inp in inputs]
            jax.block_until_ready(outs[-1])
            dt = (time.time() - t0) / len(inputs) * 1e3
            jax.block_until_ready(outs)
            best = dt if best is None else min(best, dt)
        return best

    def cost(fn, *a):
        ca = fn.lower(*a).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("bytes accessed", 0.0)), float(ca.get("flops", 0.0))

    rows = []
    prev_t = prev_b = prev_f = 0.0
    orig_pp = render.pallas_point
    render.pallas_point = False  # consistent op-by-op attribution
    try:
        for stage in STAGES:
            fn = jax.jit(partial(render._demo_impl, stop_stage=stage))
            gb, fl = cost(fn, variables, dev[0], featdev[0])
            t = time_async(fn, [(variables, b, f) for b, f in zip(dev, featdev)])
            dt, db, df = t - prev_t, gb - prev_b, fl - prev_f
            rows.append({
                "stage": str(stage), "total_ms": round(t, 2),
                "delta_ms": round(dt, 2),
                "delta_GB": round(db / 1e9, 4),
                "delta_GFLOP": round(df / 1e9, 3),
                "achieved_GBps": round(db / 1e9 / (dt / 1e3), 1) if dt > 0.05 else None,
                "pct_bw_roof": round(db / 1e9 / (dt / 1e3) / PEAK_GBPS * 100, 1)
                if dt > 0.05 else None,
                "achieved_TFLOPs": round(df / 1e12 / (dt / 1e3), 2) if dt > 0.05 else None,
            })
            prev_t, prev_b, prev_f = t, gb, fl
            r = rows[-1]
            print(
                f"{r['stage']:12s} {r['total_ms']:8.2f} ms  d {r['delta_ms']:7.2f} ms"
                f"  {r['delta_GB']:7.3f} GB  {str(r['achieved_GBps']):>7s} GB/s"
                f"  {str(r['pct_bw_roof']):>6s}% bw-roof"
                f"  {r['delta_GFLOP']:8.1f} GF {str(r['achieved_TFLOPs']):>6s} TF/s",
                flush=True,
            )
    finally:
        render.pallas_point = orig_pp

    # production fused program (pallas_point on): end-to-end roofline
    prod = jax.jit(render._demo_impl)
    gb, fl = cost(prod, variables, dev[0], featdev[0])
    t = time_async(prod, [(variables, b, f) for b, f in zip(dev, featdev)])
    prod_row = {
        "stage": "production(fused)", "total_ms": round(t, 2),
        "total_GB": round(gb / 1e9, 3),
        "achieved_GBps": round(gb / 1e9 / (t / 1e3), 1),
        "pct_bw_roof": round(gb / 1e9 / (t / 1e3) / PEAK_GBPS * 100, 1),
        "total_GFLOP": round(fl / 1e9, 1),
        "note": "XLA cost analysis excludes Pallas kernel internals",
    }
    print(
        f"production   {prod_row['total_ms']:8.2f} ms  {prod_row['total_GB']:7.3f} GB"
        f"  {prod_row['achieved_GBps']:7.1f} GB/s  {prod_row['pct_bw_roof']:6.1f}%"
        " bw-roof (excl. Pallas internals)",
        flush=True,
    )
    out = {
        "device": jax.devices()[0].device_kind,
        "peak_GBps": PEAK_GBPS,
        "peak_TFLOPs": PEAK_TFLOPS,
        "ladder": rows,
        "production": prod_row,
        "overrides": args,
    }
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)
        print(f"# wrote {json_out}", flush=True)


if __name__ == "__main__":
    main()
