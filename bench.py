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


def analytic_flops_per_frame(H, W, counts, n_smpl=6890, code_dim=32,
                             feat_ch=32):
    """Analytic model FLOPs for one progressive frame (multiply-adds x 2):
    ResNet34-UNet encoder on 3 source views, vertex-code MHA fusion, the
    sparse conv stack, and the per-point query/density/color MLPs at the
    frame's measured point counts. Gathers/scatters/compaction are excluded
    (they are bandwidth, not FLOPs) — so this MFU is a lower bound on how
    far the gather stages sit from the compute roofline."""
    V = 3
    f = 0.0
    # encoder (conv layers, stride tracked; BasicBlock = 2 convs [+1x1 ds])
    h, w = H // 2, W // 2
    f += 2 * 7 * 7 * 3 * 64 * h * w  # stem
    cin = 64
    for planes, blocks in ((64, 3), (128, 4), (256, 6)):
        h, w = h // 2, w // 2
        for b in range(blocks):
            ci = cin if b == 0 else planes
            f += 2 * 9 * ci * planes * h * w * 2  # conv1+conv2
            if b == 0:
                f += 2 * ci * planes * h * w  # 1x1 downsample
        cin = planes
    # decoder (upconv3/iconv3 at H/8, upconv2/iconv2 at H/4, out 1x1)
    h8, w8 = H // 8, W // 8
    h4, w4 = H // 4, W // 4
    f += 2 * 9 * 256 * 128 * h8 * w8 + 2 * 9 * (128 + 128) * 128 * h8 * w8
    f += 2 * 9 * 128 * 64 * h4 * w4 + 2 * 9 * (64 + 64) * feat_ch * h4 * w4
    f += 2 * feat_ch * feat_ch * h4 * w4
    f *= V
    # MHA fusion: qkv projections + attention over V keys + out proj
    f += 2 * n_smpl * (code_dim * code_dim + 2 * V * feat_ch * code_dim
                       + 2 * V * code_dim + code_dim * code_dim)
    # sparse conv stack (subm0 x2 + per level: stride + 2 subm), 27-tap
    sites = [6890, 15400, 6900, 1900, 500]  # measured typical actives
    dims = [(code_dim, code_dim)] * 2
    f += sum(2 * 27 * ci * co * sites[0] for ci, co in dims)
    cin = code_dim
    for lvl in range(4):
        f += 2 * 27 * cin * 32 * sites[lvl + 1]          # strided
        f += 2 * 27 * 32 * 32 * sites[lvl + 1] * 2       # double conv
        cin = 32
    n_rays, n_sigma, n_rgb = counts
    # per-point: trilinear lerps (4 levels x 8 taps x 32ch) + Linear 128->64
    # + density MLP + color MLP
    f += n_sigma * (2 * 4 * 8 * 32 + 2 * 128 * 64)
    f += n_sigma * 2 * (134 * 64 + 64 * 32 + 32 * 16 + 16)
    f += n_rgb * 2 * (3 * (105 * 64 + 64 * 32 + 2 * 32 * 32) + 96 * 32
                      + 32 * 16 + 16 * 3)
    return f


def main():
    import os

    import jax

    # persistent compilation cache: the bench compiles 5+ large programs
    # (fast fn + scan + ref + neg modes); repeated runs on the same
    # jaxlib/topology hit the disk cache instead of recompiling (~minutes
    # on a 1-core host). Same setup as tests/conftest.py.
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
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
    if len(sys.argv) > 1:  # ad-hoc overrides: `bench.py tpu.frame_mode True`
        cfg.merge_from_list(sys.argv[1:])
    cfg.freeze()

    render = get("render", cfg.render.file)(cfg)

    # host-side batch prep (excluded from timing, like the reference's
    # DataLoader workers); frames stride ACROSS the test set (early items
    # under-sample close-up poses whose ray/point demand is ~3x higher),
    # both RNGs seeded per item, disk-cached (utils/bench_frames.py)
    from gpnerf_tpu.utils.bench_frames import get_bench_frames

    n_frames = 10
    host_batches = get_bench_frames(cfg, n_frames)

    variables = render.init_variables(0, host_batches[0])

    import os

    ckpt_path = os.environ.get(
        "BENCH_CKPT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "artifacts", "bench_ckpt.pth"),
    )
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

    dev_batches = [
        {k: jnp.asarray(v) for k, v in b.items()} for b in host_batches
    ]

    def run_mode(render_m, cfg_m, *, reps=3, scan_cycles=3, batches=None,
                 host=None):
        """Time the progressive renderer + measure full-protocol PSNR/SSIM
        (Evaluator semantics, if_nerf.py:49-83) on the bench frames.

        Two timing protocols, both reported (BENCH_r03 post-mortem: the
        per-frame async-dispatch loop swung 39 -> 55 ms/frame between
        sessions on the networked runtime while the compiled program is
        static-shape-deterministic):
          * scan: ONE jitted lax.scan renders scan_cycles passes over the
            sequence in a single dispatch — device-side frames/sec, immune
            to per-call dispatch/RTT variance. Headline when available.
          * loop: the round-3 protocol (async per-frame dispatch, block on
            the last), repeated `reps` times, best rep reported, plus a
            per-frame completion-stamp spread so a slow session
            self-diagnoses (dispatch-bound vs device-bound)."""
        dbs = dev_batches if batches is None else batches
        hbs = host_batches if host is None else host
        fn = render_m.render_demo_fn()
        jax.block_until_ready(fn(variables, dbs[0]))  # compile
        jax.block_until_ready(fn(variables, dbs[1 % n_frames]))

        # protocol 1: async per-frame loop, best of `reps`
        loop_dts, disp_dts, rets = [], [], None
        for _ in range(reps):
            t0 = time.perf_counter()
            rets = [fn(variables, b) for b in dbs]
            disp_dts.append(time.perf_counter() - t0)
            jax.block_until_ready(rets[-1])
            loop_dts.append(time.perf_counter() - t0)
        loop_dt = min(loop_dts)

        # protocol 2: one-dispatch scan over scan_cycles * n_frames frames
        scan_fps = None
        frame_ms = None
        if scan_cycles:
            stacked = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs), *dbs
            )
            order = jnp.asarray(
                list(range(n_frames)) * scan_cycles, jnp.int32
            )
            sfn = render_m.render_demo_scan_fn()
            souts = jax.block_until_ready(sfn(variables, stacked, order))
            t0 = time.perf_counter()
            souts = jax.block_until_ready(sfn(variables, stacked, order))
            sdt = time.perf_counter() - t0
            scan_fps = len(order) / sdt
            # scan counters must agree with the per-frame loop's
            so = np.asarray(souts["overflows"])[:n_frames]
            lo = np.stack([np.asarray(r["overflows"]) for r in rets])
            assert (so == lo).all(), (so, lo)
            # per-frame DEVICE time by scan isolation: order=[i]*cycles runs
            # frame i `cycles` times sequentially on-device in ONE dispatch
            # — the tunnel round-trip amortizes to ~RTT/cycles (a constant
            # bias, identical for every frame). Replaces the round-4
            # completion-stamp diffs, which measured host/tunnel observation
            # jitter (RTT ~24 ms on this runtime) around a flat device cost:
            # scan isolation shows 1.03x max/min across the bench frames
            # where the stamps swung 1.8-3.2x (tools/diag_spread.py,
            # VERDICT r4 #3 root cause — artifact, not a device stall).
            iso_cycles = 5
            # the iso order length differs from the scan program's, so the
            # first call compiles a second program — warm it OUTSIDE the
            # timed loop (one shape, shared by every frame's measurement)
            jax.block_until_ready(
                sfn(variables, stacked, jnp.zeros((iso_cycles,), jnp.int32))
            )
            frame_ms = []
            for i in range(n_frames):
                oi = jnp.full((iso_cycles,), i, jnp.int32)
                t0 = time.perf_counter()
                jax.block_until_ready(sfn(variables, stacked, oi))
                frame_ms.append(
                    (time.perf_counter() - t0) / iso_cycles * 1e3
                )
            frame_ms = np.asarray(frame_ms)
        if frame_ms is None:
            # no scan program (ref mode): completion stamps, host-observed
            # (noise <1% at ~500 ms/frame)
            t0 = time.perf_counter()
            stamp_rets = [fn(variables, b) for b in dbs]
            stamps = []
            for r in stamp_rets:
                jax.block_until_ready(r["overflows"])
                stamps.append(time.perf_counter() - t0)
            frame_ms = np.diff([0.0] + stamps) * 1e3

        # hard-cap overflows / counts across ALL frames (per-ray K drops
        # are the designed graceful path and reported separately)
        all_over = np.stack([np.asarray(r["overflows"]) for r in rets])
        all_counts = np.stack(
            [np.asarray(r.get("counts", [0, 0, 0])) for r in rets]
        )
        from gpnerf_tpu.train.evaluator import Evaluator

        from gpnerf_tpu.render.demo import pred_img_hwc

        ev = Evaluator(cfg_m, "bench")
        for r, b in zip(rets, hbs):
            ev.evaluate({"pred_img": pred_img_hwc(r)}, b)
        fps = scan_fps if scan_fps is not None else n_frames / loop_dt
        return {
            "fps": fps,
            "ms_per_frame": 1000.0 / fps,
            "fps_loop": n_frames / loop_dt,
            "loop_ms_per_frame": loop_dt / n_frames * 1000.0,
            "loop_reps_ms": [round(d / n_frames * 1e3, 2) for d in loop_dts],
            # dispatch time of the BEST rep (the one loop fps reports), plus
            # every rep's, so a dispatch-bound session self-diagnoses
            "loop_dispatch_ms": round(
                disp_dts[int(np.argmin(loop_dts))] * 1e3, 2
            ),
            "loop_dispatch_reps_ms": [round(d * 1e3, 2) for d in disp_dts],
            "frame_ms_spread": [
                round(float(f), 2)
                for f in (frame_ms.min(), np.median(frame_ms), frame_ms.max())
            ],
            "overflows": all_over.max(axis=0).tolist(),
            "counts_max": all_counts.max(axis=0).tolist(),
            "counts_mean": all_counts.mean(axis=0).tolist(),
            "psnr": float(np.mean(ev.psnr)),
            "ssim": float(np.mean(ev.ssim)),
        }

    fast = run_mode(render, cfg)

    # MFU vs v5e peak (197 TFLOPS bf16); analytic FLOPs exclude gathers, so
    # low MFU quantifies how gather/dispatch-bound the pipeline is
    flops = analytic_flops_per_frame(
        512, 512, fast["counts_mean"], code_dim=cfg.head.sigma.code_dim
    )
    mfu = flops * fast["fps"] / 197e12
    fast_line = {
        "metric": "synthetic-body 512x512 progressive render",
        "value": round(fast["fps"], 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fast["fps"] / 20.0, 3),
        "mfu": round(mfu, 5),
        "psnr": round(fast["psnr"], 3),
        "ssim": round(fast["ssim"], 4),
    }
    print(json.dumps(fast_line), flush=True)
    print(
        f"# {fast['ms_per_frame']:.1f} ms/frame (scan); async-loop "
        f"{fast['loop_ms_per_frame']:.1f} ms/frame (reps {fast['loop_reps_ms']},"
        f" dispatch {fast['loop_dispatch_ms']} ms, per-frame device "
        f"(scan-isolated, +RTT/5 bias) min/med/max "
        f"{fast['frame_ms_spread']} ms); max overflows(ray,perrayK,sigma,rgb)="
        f"{fast['overflows']}; max counts(rays,sigma,rgb)={fast['counts_max']}; "
        f"device={jax.devices()[0].device_kind}",
        file=sys.stderr,
    )

    # HBM bandwidth roofline (VERDICT r4 #2): XLA's own cost analysis of the
    # compiled production program (post-fusion optimized HLO) counts the HBM
    # bytes every fused op touches; against the scan ms/frame that yields
    # achieved GB/s vs the v5e 819 GB/s peak — converting "gather-bound"
    # from an assertion into a measurement. Per-stage attribution:
    # tools/roofline.py. Caveat: the Pallas megakernel's internals are a
    # custom call XLA cannot cost (its HBM operands are counted; VMEM
    # residents are not traffic anyway).
    if os.environ.get("BENCH_ROOF", "1") != "0":
        try:
            ca = (
                render.render_demo_fn()
                .lower(variables, dev_batches[0])
                .compile()
                .cost_analysis()
            )
            if isinstance(ca, list):
                ca = ca[0]
            gbytes = float(ca.get("bytes accessed", 0.0)) / 1e9
            gbps = gbytes / (fast["ms_per_frame"] / 1e3)
            roof = {
                "xla_GB_per_frame": round(gbytes, 3),
                "achieved_GBps": round(gbps, 1),
                "pct_hbm_roof": round(gbps / 819.0 * 100.0, 1),
                "peak_GBps": 819.0,
            }
            fast_line["roofline"] = roof
            fast["roofline"] = roof
            print(
                f"# roofline: XLA-counted {gbytes:.2f} GB HBM/frame -> "
                f"{gbps:.0f} GB/s at {fast['ms_per_frame']:.1f} ms/frame = "
                f"{roof['pct_hbm_roof']:.0f}% of 819 GB/s v5e peak "
                f"(per-stage: tools/roofline.py)",
                file=sys.stderr,
            )
        except Exception as e:  # cost analysis is best-effort diagnostics
            print(f"# roofline unavailable: {e!r}", file=sys.stderr)

    # every extra mode persists independently (each gated only by its own
    # env var; BENCH_MODES.json is written after EVERY completed mode so an
    # externally-timed-out run still leaves the finished ones on disk)
    modes = {"fast": {**fast_line, **fast}}

    def persist(m):
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "BENCH_MODES.json"), "w"
        ) as f:
            json.dump(m, f, indent=1)

    persist(modes)

    # Reference-semantics mode (VERDICT r2 #3): exact demo_render.py:270-283
    # cull — sum-over-levels occupancy blanket, all 64 kept samples, raised
    # caps — benchmarked every round alongside the speed defaults so
    # speed-mode drift from reference quality stays visible. Reported as a
    # '#'-prefixed JSON (the driver parses the single bare JSON line above)
    # and persisted with the fast mode in BENCH_MODES.json.
    if os.environ.get("BENCH_REF", "1") != "0":
        cfg_ref = cfg.clone()
        cfg_ref.defrost()
        cfg_ref.tpu.tight_cull = False
        cfg_ref.tpu.samples_per_ray = 64
        cfg_ref.tpu.tap_window = 0
        # reference projector samples source rgb at FULL image resolution
        # (demo_render.py:586); the low-res merged table is a speed-mode
        # deviation and stays out of this mode
        cfg_ref.tpu.merge_lowres_src = False
        # loose-cull demand measured on the bench frames: 2.52M sigma
        # points / up to 51,432 rays — caps sized to run drop-free with
        # ~11% headroom. Every per-point cost scales with ray_cap * 64
        # under dense_slots, so the cap rides close to demand; a drop
        # surfaces as a hard ray_overflow failure, never silently.
        cfg_ref.tpu.ray_cap = 57344
        cfg_ref.tpu.sigma_cap = 2293760
        cfg_ref.tpu.rgb_cap = 1048576
        # windowless frame mode (in-kernel sp_feats>0 cull, no tap/slot
        # machinery) is available as tpu.frame_mode True but stays OFF
        # here: its XLA compile runs 7+ minutes on this runtime (vs ~3 for
        # the dense-slots form), which would blow the driver's bench
        # budget on a cold compile cache. BENCH_REF_FRAME=1 opts in.
        if os.environ.get("BENCH_REF_FRAME", "0") == "1":
            cfg_ref.tpu.frame_mode = True
        cfg_ref.freeze()
        render_ref = get("render", cfg_ref.render.file)(cfg_ref)
        # ref mode runs ~500 ms/frame: per-frame dispatch noise is <1% there,
        # so skip the scan program (saves its compile) and a third loop rep
        ref = run_mode(render_ref, cfg_ref, reps=2, scan_cycles=0)
        ref_line = {
            "metric": "reference-cull-semantics 512x512 progressive render",
            "value": round(ref["fps"], 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round(ref["fps"] / 20.0, 3),
            "psnr": round(ref["psnr"], 3),
            "ssim": round(ref["ssim"], 4),
        }
        print("# ref-mode " + json.dumps(ref_line), flush=True)
        print(
            f"# ref-mode {ref['ms_per_frame']:.1f} ms/frame; max overflows="
            f"{ref['overflows']}; max counts={ref['counts_max']}",
            file=sys.stderr,
        )
        modes["reference_semantics"] = {**ref_line, **ref}
        persist(modes)

    # neg-ray (THuman-convention) progressive render (VERDICT r3 #5):
    # the same fixture scene served through OpenGL-convention cameras
    # (scene at negative camera z — what makes the real THuman dataset
    # neg_ray; CustomDataset.py renders, data_utils.py:123-127). The
    # published cross-dataset protocol (BASELINE config 5, test.sh:7)
    # evaluates on ZJU — its eval fps IS the fast mode above — so this
    # entry measures the path that protocol never touches: full-image
    # progressive rendering under the flipped parameterization (THuman
    # quick_val / THuman-eval analog).
    if os.environ.get("BENCH_NEG", "1") != "0":
        cfg_neg = cfg.clone()
        cfg_neg.defrost()
        cfg_neg.dataset.test.name = "thuman-synthetic"
        cfg_neg.freeze()
        render_neg = get("render", cfg_neg.render.file)(cfg_neg)
        assert render_neg.neg_ray_val
        neg_host = get_bench_frames(cfg_neg, n_frames)
        neg_dev = [
            {k: jnp.asarray(v) for k, v in b.items()} for b in neg_host
        ]
        neg = run_mode(render_neg, cfg_neg, reps=2, scan_cycles=3,
                       batches=neg_dev, host=neg_host)
        neg_line = {
            "metric": "neg-ray (THuman-convention) 512x512 progressive"
                      " render",
            "value": round(neg["fps"], 3),
            "unit": "frames/sec/chip",
            "vs_baseline": round(neg["fps"] / 20.0, 3),
            "psnr": round(neg["psnr"], 3),
            "ssim": round(neg["ssim"], 4),
        }
        print("# neg-ray " + json.dumps(neg_line), flush=True)
        print(
            f"# neg-ray {neg['ms_per_frame']:.1f} ms/frame; max "
            f"overflows={neg['overflows']}; max counts={neg['counts_max']}",
            file=sys.stderr,
        )
        modes["thuman_neg_ray"] = {**neg_line, **neg}
        persist(modes)


if __name__ == "__main__":
    main()
