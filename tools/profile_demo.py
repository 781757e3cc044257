"""Stage profiler for the progressive renderer (run on TPU).

Uses the renderer's `profile()` (stage-prefix jits over the exact production
pipeline, mapped onto the reference's `time_slots` names,
/root/reference/libs/renders/demo_render.py:97-357). Loads the trained
checkpoint when present (realistic occupancy); otherwise warms BatchNorm
statistics first — on this runtime, cold (empty-occupancy) measurements are
meaningless because degenerate gather/scatter index patterns execute much
faster than real ones.

Usage: python tools/profile_demo.py [ckpt.pth] [--async]

--async: time each stage prefix over N DISTINCT frames dispatched without
blocking (the bench protocol) — amortizes the ~30 ms dispatch round-trip
that dominates blocking measurements on this networked runtime. Distinct
frames defeat the runtime's memoization of repeated identical executions.
Stop-stage programs fold a checksum of every prior side product into their
output (tables["anchor"], render/demo.py), so XLA cannot DCE table builds
out of a prefix: each program is a strict superset of the previous one and
deltas attribute honestly. The anchor sums cost ~0.5 ms the full (None)
program does not pay, so the last delta is under-credited by about that.
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
    args = [a for a in sys.argv[1:] if a != "--async"]
    use_async = "--async" in sys.argv[1:]
    ckpt = args[0] if args else "artifacts/bench_ckpt.pth"
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.dataset.H = 512
    cfg.dataset.W = 512
    cfg.dataset.ratio = 1.0
    cfg.head.sigma.code_dim = 32
    cfg.render.file = "demo_render"
    cfg.freeze()

    render = get("render", cfg.render.file)(cfg)
    if use_async:
        # bench frame protocol (deterministic target views, realistic pose
        # spread, disk-cached host batches)
        from gpnerf_tpu.utils.bench_frames import get_bench_frames

        frames = get_bench_frames(cfg, 8)
    else:
        np.random.seed(0)
        ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
        frames = [ds[i] for i in range(4)]
    variables = render.init_variables(0, frames[0])

    import os

    if os.path.exists(ckpt):
        from gpnerf_tpu.train.checkpoint import load_eval_model

        variables = load_eval_model(ckpt, variables, cfg.head.sigma.n_layers)
    else:
        batch0 = {k: jnp.asarray(v) for k, v in frames[0].items()}
        featmaps = render.encode_fn()(variables, batch0["src_imgs"])
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

    # stage-prefix timing on the exact production pipeline
    enc = render.encode_fn()
    featdev = [enc(variables, b["src_imgs"]) for b in dev]
    jax.block_until_ready(featdev[-1])

    def time_async(fn, inputs):
        """Wall clock of len(inputs) pipelined executions / n (ms)."""
        jax.block_until_ready(fn(*inputs[0]))  # compile + warm
        jax.block_until_ready(fn(*inputs[1 % len(inputs)]))
        t0 = time.time()
        outs = [fn(*inp) for inp in inputs]
        jax.block_until_ready(outs[-1])
        dt = time.time() - t0
        jax.block_until_ready(outs)  # force every result (elision guard)
        return dt / len(inputs) * 1000.0, outs

    prev = 0.0
    for stage in ("pre", "codes", "fuse", "occv", "volume", "rays",
                  "cull_occ", "cull_slots", "cull_compact", "cull", "sigma_q",
                  "meanvar", "sigma", "rgb", None):
        fn = jax.jit(partial(render._demo_impl, stop_stage=stage))
        if use_async:
            t, _ = time_async(
                fn, [(variables, b, f) for b, f in zip(dev, featdev)]
            )
        else:
            jax.block_until_ready(fn(variables, dev[0], featdev[0]))
            ts = []
            for b, f in zip(dev, featdev):
                t0 = time.time()
                jax.block_until_ready(fn(variables, b, f))
                ts.append(time.time() - t0)
            t = min(ts) * 1000.0
        print(f"{str(stage):12s} total {t:7.1f} ms  delta {t - prev:7.1f} ms", flush=True)
        prev = t

    # encoder (etime) timing
    if use_async:
        t, _ = time_async(
            jax.jit(lambda v, im: enc(v, im)),
            [(variables, b["src_imgs"]) for b in dev],
        )
        print(f"encoder (etime) {t:7.1f} ms", flush=True)
    else:
        ts = []
        for b in dev:
            t0 = time.time()
            jax.block_until_ready(enc(variables, b["src_imgs"]))
            ts.append(time.time() - t0)
        print(f"encoder (etime) {min(ts) * 1000:7.1f} ms", flush=True)

    # end-to-end production path
    run = render.render_demo_fn()
    if use_async:
        t, outs = time_async(run, [(variables, b) for b in dev])
        ret = outs[-1]
        print(
            f"end-to-end      {t:7.1f} ms  overflows "
            f"{np.asarray(ret['overflows']).tolist()}",
            flush=True,
        )
    else:
        jax.block_until_ready(run(variables, dev[0]))
        ts = []
        for b in dev:
            t0 = time.time()
            ret = jax.block_until_ready(run(variables, b))
            ts.append(time.time() - t0)
        print(
            f"end-to-end      {min(ts) * 1000:7.1f} ms  overflows "
            f"{np.asarray(ret['overflows']).tolist()}",
            flush=True,
        )


if __name__ == "__main__":
    main()
