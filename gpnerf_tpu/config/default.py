"""Default configuration tree.

Schema-compatible with the reference's yacs defaults
(/root/reference/configs/default.py:1-141): every key the reference defines
exists here with the same name, type, and default, so the reference's YAML
experiment files and dotted CLI overrides work unchanged. A `tpu` block is
added for TPU-native knobs (static capacities, mesh axes, precision) that
have no reference counterpart.
"""

from gpnerf_tpu.config.yacs_compat import CfgNode as CN

cfg = CN()

cfg.device = "tpu"

cfg.dist_backend = "jax"  # reference: 'nccl'; we use jax.distributed + ICI

cfg.log_dir = "logs/"
cfg.output_dir = "outputs/"
cfg.result_dir = "results/"

cfg.seed = 42

cfg.workers = 4

cfg.pi = "psnr"
cfg.cam_num = -1
cfg.fix_human = False
cfg.fix_pose = False
cfg.mask_bkgd = True
cfg.src_view_num = 3
cfg.num_frame = 200
cfg.xyz_res = 10
cfg.view_res = 4


# dataset
cfg.dataset = CN()

cfg.dataset.img_num_per_gpu = 1

cfg.dataset.H = 1024
cfg.dataset.W = 1024
cfg.dataset.ratio = 0.5
cfg.dataset.voxel_size = [0.005, 0.005, 0.005]

cfg.dataset.train = CN()
cfg.dataset.train.name = "thuman"
cfg.dataset.train.data_root = "data/thuman/"
cfg.dataset.train.file = "CustomDataset"
cfg.dataset.train.dataset_cams = 24
cfg.dataset.train.sampler = ""
cfg.dataset.train.batch_sampler = "default"
cfg.dataset.train.sampler_meta = CN(
    {"min_hw": [256, 256], "max_hw": [480, 640], "strategy": "range"}
)
cfg.dataset.train.drop_last = True
cfg.dataset.train.shuffle = True
cfg.dataset.train.seq_list = []
cfg.dataset.train.interval = 1
cfg.dataset.train.chunk = 400

cfg.dataset.test = CN()
cfg.dataset.test.name = "zju_mocap"
cfg.dataset.test.data_root = "data/zju_mocap/"
cfg.dataset.test.file = "ZjumocapDataset"
cfg.dataset.test.dataset_cams = 24
cfg.dataset.test.sampler = ""
cfg.dataset.test.batch_sampler = "default"
cfg.dataset.test.sampler_meta = CN(
    {"min_hw": [480, 640], "max_hw": [480, 640], "strategy": "origin"}
)
cfg.dataset.test.drop_last = False
cfg.dataset.test.shuffle = False
cfg.dataset.test.seq_list = ["CoreView_315"]
cfg.dataset.test.interval = 7
cfg.dataset.test.chunk = 2000


# network render
cfg.render = CN()
cfg.render.file = "BaseRender"
cfg.render.resume_path = ""

# encoder
cfg.encoder = CN()
cfg.encoder.name = "resnet34"
cfg.encoder.file = "UNet"
cfg.encoder.out_ch = 32

# nerfhead
cfg.head = CN()
cfg.head.file = "BaseNeRFHead"
# head rgb branch
cfg.head.rgb = CN()
cfg.head.rgb.use_rgbhead = True
# head sigma branch
cfg.head.sigma = CN()
cfg.head.sigma.code_dim = 16
cfg.head.sigma.n_heads = 4
cfg.head.sigma.n_layers = 4
cfg.head.sigma.n_smpl = 6890
cfg.head.sigma.outdims = [32, 32, 32, 32]


# train
cfg.train = CN()

cfg.train.file = "BaseTrainer"
cfg.train.criterion_file = "BaseNeRFCriterion"

cfg.train.resume = False

cfg.train.body_sample_ratio = 0.5
cfg.train.n_rays = 1024
cfg.train.n_samples = 64

cfg.train.ep_iter = 500
cfg.train.lr = 1e-4
cfg.train.gamma = 0.1
cfg.train.decay_epochs = 1000
cfg.train.weight_decay = 0.0001
cfg.train.max_epoch = 1000

cfg.train.print_freq = 10
cfg.train.save_every_checkpoint = True
cfg.train.save_interval = 1
cfg.train.valiter_interval = 100
cfg.train.val_when_train = False


# test
cfg.test = CN()

cfg.test.save_imgs = True
cfg.test.test_seq = "CoreView_315"
cfg.test.is_vis = False
cfg.test.mesh_th = 50
# emit the reference-shaped 10-slot per-stage timing dict
# (demo_render.py:97-357 time_slots) via the demo renderer's stage-prefix
# profile() before evaluation; off by default — each extra profiled program
# pays a ~30 ms dispatch round-trip on a networked runtime, so inline
# per-frame timing is served by this opt-in instead
cfg.test.profile = False


# ---------------------------------------------------------------------------
# TPU-native knobs (no reference counterpart). Static capacities size the
# padded buffers that replace the reference's dynamic-shape paths.
# ---------------------------------------------------------------------------
cfg.tpu = CN()
# voxel-site capacity at the sparse volume's input level (>= #unique SMPL
# voxels; 6890 vertices -> <=6890 unique 5mm voxels)
cfg.tpu.site_cap = 8192
# per-level site capacities for strided-conv active-set generation
# (measured on the 6,890-vertex body: ~15.4k/6.9k/1.9k/0.5k actives at
# levels 1-4; sized with headroom for spread poses)
cfg.tpu.level_caps = [20480, 10240, 4096, 2048]
# static dense volume shape (dhw), multiple of 32; per-frame out_sh is
# clamped/padded into this buffer so XLA sees one shape
cfg.tpu.max_out_sh = [96, 384, 384]
# progressive (demo) renderer: ray / sample-point / color-point capacities,
# measured on the trained synthetic model at 512^2 (tight splat + per-ray
# K-slots): ~15k rays, ~156k sigma points, ~134k color points per frame;
# caps sized with ~2x headroom. Overflow degrades gracefully (per-ray K
# drops farthest samples; global compaction drops the deepest slot) and is
# reported per frame in the render output's `overflows`.
cfg.tpu.ray_cap = 32768
cfg.tpu.sigma_cap = 319488
cfg.tpu.rgb_cap = 196608
# per-ray cap on occupancy-surviving samples (of the reference's 64-sample
# grid): the progressive renderer keeps each ray's nearest K survivors in a
# rectangular (ray, K) frame before the global sigma_cap compaction.
# Overflow drops the farthest (occluded behind the front surface) samples
# of that ray first and is reported per frame. Full-60-frame sweeps on the
# trained model at 512^2 (round 3, splat-bin cull): K=13 -> PSNR 22.706 /
# SSIM 0.92414 with ZERO sigma drops (sigma_cap 319488 = ray_cap*13 covers
# worst-case demand; the shipped combination, -0.125 dB vs the unculled
# BaseRender anchor 22.831); K=12 -> 22.668; K=14 (W=32 tap, no splat
# bins) -> 22.691; K=16/24 (round 2) -> 22.703 with worst-frame drops.
cfg.tpu.samples_per_ray = 13
# cull against level-1-only occupancy (tight body shell) instead of the
# reference's sum-over-levels field whose coarse levels blanket ~8 cm around
# the body. Full-60-frame sweep on the trained synthetic model at 512^2
# (round 2, final caps): PSNR/SSIM 22.69/0.925 (tight) vs 19.27/0.882
# (reference cull) vs 22.82/0.926 (unculled BaseRender). Under the per-ray
# K-slot frame the tight cull is REQUIRED for quality, not just speed: the
# loose blanket fills a ray's nearest-K slots with empty space and drops
# the true surface samples. To run exact reference cull semantics set
# tight_cull False AND samples_per_ray 64 (and raise ray/sigma caps).
cfg.tpu.tight_cull = True
# blanket-mode (tight_cull False) splat compaction: compact the
# sum-over-levels occupied voxels to this many rows before the pixel/bin
# splat scatters instead of streaming the whole dense walk (~860k rows on
# the synthetic grid) through them. EXACT when drop-free — every occupied
# voxel still splats; drops count into ray_overflow (hard failure, caught
# by the bench/eval zero-overflow gates). Demand on the synthetic bench
# frames: <= 273k occupied sum-over-levels voxels -> 1.4x headroom
# (still 2.2x fewer scatter rows than the ~860k dense walk). 0 = dense.
cfg.tpu.splat_cap = 393216
# occupancy-tap window W (0 = off): tap only W consecutive samples of the
# reference 64-grid starting at each ray's splat-derived front depth (minus
# a 3-voxel margin) instead of all 64 candidates — candidates more than W
# samples behind the front surface are occluded (transmittance ~0, the same
# argument as samples_per_ray). Cuts the dominant tap-gather count 64/W.
# Full-60-frame sweep on the trained model at 512^2 (round 3): PSNR 22.681
# (W=32) vs 22.685 (off) / SSIM 0.92342 vs 0.92476; W=24 loses 0.016 dB.
cfg.tpu.tap_window = 32
# BaseRender full-image eval: padded capacity for all bound-mask rays
cfg.tpu.eval_ray_cap = 131072
# eval chunk size (rays per lax.map step on the BaseRender eval path)
cfg.tpu.eval_chunk = 8192
# uint8-quantize the demo renderer's octet feature tables (per-channel
# scales; post-ReLU activations): halves the dominant random-gather bytes
cfg.tpu.quantize_volume = True
# build/store the quantized octet tables as packed uint32 words: XLA's
# minor-axis concat of 8 strided u8 slices runs at sub-word granularity;
# packing 4 channels/word quarters the build's element count (identical
# table bytes — rows unpack after the gather, bit-exact). MEASURED SLOWER
# on v5e (14.4 vs 17.2 fps bench): the post-gather unpack shifts cost more
# than the build saves; kept as an option.
cfg.tpu.pack_octet_u32 = False
# per-view (V, P) projection gather + float-output transpose instead of the
# (P, V)-ordered single gather — a layout-assignment trade measured per
# pipeline generation (ops/projection.py)
cfg.tpu.proj_vp_order = False
# fuse the projection gather's 4-tap weighted sum + int8 dequant in a Pallas
# kernel writing (V, C, P) view-major/point-on-lanes (ops/pallas_lerp.py) —
# TPU backend only; measured 43.6 -> 41.4 ms/frame (XLA re-tiled the int8
# gather output twice before its fused weighted sum)
cfg.tpu.pallas_lerp = True
# fused point-stage megakernel: projection quad-lerp + multi-view mean/var +
# sigma-feat linear + density MLP + color MLP + masks in ONE Pallas kernel
# (ops/pallas_point.py); supersedes pallas_lerp on the demo hot path. TPU
# backend only; the XLA op-by-op path remains for CPU/tests/profiling.
cfg.tpu.pallas_point = True
# lerp the multi-scale geometry rows INSIDE the point megakernel: the XLA
# octet query's (P, 8, C) dequant expansion and (P, F) feature round-trip
# stay in VMEM; XLA keeps only the raw row gathers. Requires pallas_point;
# layouts the kernel does not lerp (lerp-axes l1_nearest rungs, int4,
# u32-packed) fall back to the XLA query automatically.
cfg.tpu.kernel_octet = True
# int8-quantize the merged [rgb|feat] projection table (per-channel
# symmetric scales, dequantized after the bilinear sum): halves the bytes
# of the largest per-point gather and its (P, V, C) relayout. Only applies
# with merge_lowres_src/merge_src_feat. Measured 17.2 -> 18.1 fps on v5e
# with bench PSNR bit-identical (22.573 vs 22.572); default on.
cfg.tpu.quantize_proj = True
# eval-only dense-convolution form of the sparse conv stack (demo
# renderer): SubM/stride convs run as masked dense XLA conv3d over the
# level volumes from level 1 down — parity-tested against the rows path
# (3e-7 end-to-end). MEASURED SLOWER on v5e (12.12 vs 12.58 fps bench):
# XLA's small-channel conv3d does not beat the table gathers there; kept
# as an option for hardware where regular conv wins.
cfg.tpu.dense_conv = False
# frame mode: evaluate the K consecutive front-anchored 64-grid samples of
# every ray as the (K, R) frame directly — no occupancy tap, no rank or
# global compaction, no composite scatters; the tight occupancy cull
# becomes a zero-density mask read off the multi-scale query (trilinear
# level-1 channel sum > 0 — the reference's sp_feats > 0 cull restricted
# to level 1). Requires tap_window > 0; non-neg_ray datasets only.
cfg.tpu.frame_mode = False
# dense slots: evaluate ALL K*ray_cap per-ray compacted slots as the dense
# slot-major (K, R) frame — the same surviving points as the compacted
# path (per-ray rank compaction unchanged) plus masked zero-weight rows —
# instead of globally compacting to sigma_cap. Drops the global nonzero,
# the point-recompute gather, and the sigma/rgb composite scatter-backs at
# the cost of ~K*ray_cap/sigma_cap more rows through the point stages.
# Quality-identical to the compacted path when that path runs drop-free.
# Measured on the v5e bench: 13.06 -> 14.47 fps (fast mode) and
# 1.68 -> 1.90 fps (reference-semantics mode), PSNR/SSIM bit-identical.
cfg.tpu.dense_slots = True
# zmin-window front margin in level-0 voxels (6 = 3 level-1 voxels)
cfg.tpu.window_margin_voxels = 6.0
# splat-bin cull: occupied voxels scatter per-pixel depth-bin occupancy
# masks during the pixel splat; the per-sample occupancy tap (ray_cap * W
# random byte gathers, the largest single op of the fast pipeline) becomes
# ONE (n_samples,)-byte-row gather per ray. The cull keeps sample s of
# pixel p iff an occupied voxel splat-covers (p +- 1 px, bin s +- margin) —
# the same splat+dilation geometry that generates the rays. tight_cull
# non-neg_ray only; falls back to the tap otherwise. The separable form
# (one scatter + shift-OR span/quad dilation) measured 18.1 -> 20.5-21.1
# fps on the v5e bench (with K 14 -> 13) at full-set PSNR 22.706; default
# on.
cfg.tpu.splat_bins = True
# half-extent of a voxel's depth-bin coverage, level-0 voxel units
cfg.tpu.bin_margin_voxels = 2.0
# upsample encoder features to source resolution (align-corners separable
# matmuls, once per frame) and pack them WITH the source rgb into one
# [rgb|feat] quad table: ONE projection gather per (point, view) instead
# of two
cfg.tpu.merge_src_feat = False
# opposite merge: downsample source rgb (align-corners bilinear) to the
# encoder feature grid and pack [rgb|feat] into ONE small quad table — one
# projection gather per (point, view) instead of two, at the cost of rgb
# detail above the feature grid's Nyquist
cfg.tpu.merge_lowres_src = False
# merge levels 2-4 into ONE combined octet table at level-2 resolution
# (coarse fields resampled by dense separable matmuls once per frame):
# the multi-scale point query drops from 4 random gathers to 2. Full-set
# sweep (round 3, with W=32/K=12): 22.677 PSNR vs 22.670 unmerged —
# reinterpolation of the smooth coarse features is quality-neutral.
cfg.tpu.merge_coarse_octet = True
# fold out_geometry_fc's coarse-channel block into the merged coarse table
# build: trilinear interpolation is linear, so W2 @ trilerp(v) ==
# trilerp(W2 @ v) — the per-frame dense matmul shrinks the coarse octet
# rows 96 -> 64 channels (25% of the dominant per-point gather bytes) and
# the per-point query skips that block of the linear. The folded field is
# signed (int8 scales when quantize_volume). Requires merge_coarse_octet;
# exact in f32, quantization error redistributes (full-set sweep
# validated).
cfg.tpu.fold_coarse_fc = True
# int4-pack the FOLDED coarse octet table (two channels per byte,
# split-pack, per-channel scales): halves that table's gather row bytes
# (512 -> 256 B/point). Requires fold_coarse_fc + quantize_volume.
# MEASURED SLOWER on v5e under the current XLA (43.3 vs 36.0 ms/frame
# bench): the post-gather nibble shift/mask/concat costs more than the
# bytes save — the same sub-word re-cost as pack_octet_u32. Quality is
# fine (full-set 22.697 vs 22.705); kept as an option for compilers
# where nibble ops fuse into the gather consumer.
cfg.tpu.int4_coarse = False
# int4 split-pack the SPLIT-mode (reference-semantics) encoder-feature
# quad table: halves the bytes of that mode's dominant per-point VMEM
# gather; nibbles unpack INSIDE the point megakernel (the earlier XLA-side
# nibble experiments lost to shift/mask re-costs — in-kernel VPU shifts
# are native). Requires quantize_proj + pallas_point (no op-by-op int4
# sampler). Off by default pending the full-set quality gate.
cfg.tpu.int4_feat = False
# sample the FOLDED coarse table nearest-neighbor (one 64-byte row-gather
# per point instead of a 512-byte octet row): 8x fewer coarse gather
# bytes, piecewise-constant interpolation of the smooth coarse field.
# 0 = off (trilinear octet), 1 = nearest at the native level-2 grid,
# 2 = nearest at the level-1 grid (field upsampled once per frame by
# dense separable matmuls — same total table bytes as the octet form,
# half the piecewise-constant step). Requires fold_coarse_fc +
# quantize_volume. Default 2: full-set sweep 22.720 PSNR / 0.9243 SSIM
# vs 22.705 / 0.9241 trilinear, 27.9 vs 26.5 fps (r4); the level-2-grid
# form (1) is faster still (29.8 fps) but costs 0.2 dB.
cfg.tpu.coarse_nearest = 2
# sample the LEVEL-1 table from 32 B/point flat rows instead of the
# 256 B octet row (drops the corner-scatter table build). 0 = off
# (trilinear octet), 1 = nearest at the native level-1 grid, 2 = nearest
# at the half-voxel grid (u8 midpoint-interleave doubling once per frame
# — measured OFF: the 8x table thrashes the gathers, 15 fps), 10+bitmask
# (bit 0 = d, 1 = h, 2 = w) = LINEAR along the set axes / nearest on the
# rest, 2^popcount corner gathers (17 = full trilinear from flat rows).
# The level-1 field is the sharp local one, so every value is
# quality-gated by the full-set sweep before any default change.
cfg.tpu.l1_nearest = 0
# ALSO apply the reference's exact trilinear sp_feats > 0 cull
# (demo_render.py:274-283) at the progressive renderer's density stage in
# the compacted (non-frame) modes. The voxel-granular occupancy tap admits
# fringe samples whose trilinear level-1 support is <= 0; off by default
# (the alpha cull keeps it quality-neutral on the full-set sweep), used by
# the demo-vs-Base consistency test together with base_occupancy_cull.
cfg.tpu.sigma_query_cull = False
# apply the progressive renderer's empty-space cull (zero sigma where the
# level-1 queried feature's channel sum is <= 0 — the reference
# demo_render.py:294 sp_feats > 0 semantics) in the TRAINING renderer's
# eval path too. Off by default (the reference's BaseRender evaluates
# every in-bounds sample); used by the demo-vs-Base consistency test so
# both pipelines run under the same cull — a trained head can emit
# positive density on zero multi-scale features (unsupervised empty space
# renders as fog on mask-zeroed GT), which is a checkpoint property, not
# a pipeline difference.
cfg.tpu.base_occupancy_cull = False
# matmul precision: 'bfloat16' or 'float32'
cfg.tpu.matmul_dtype = "bfloat16"
# training compute precision for the BaseRender train step: 'float32'
# (default, exact reference numerics) or 'bfloat16' (mixed precision:
# f32 master params / optimizer state / norm statistics, bf16 matmuls and
# convs; compositing and the loss always run f32)
# bf16 mixed-precision training exists (f32 master params/optimizer/norm
# stats, bf16 matmuls+convs) but MEASURED SLOWER than f32 on the v5e
# (0.21 vs 0.17 s/it warm, 60-iter synthetic config): XLA's default-
# precision f32 dots already run as bf16 MXU passes, so the explicit casts
# add traffic without adding MXU throughput. Kept as an option for
# hardware/precision configs where it wins.
cfg.tpu.train_dtype = "float32"
# mesh axis name + size for data parallelism (-1 = all devices)
cfg.tpu.dp_axis = "dp"
cfg.tpu.dp_size = -1


def update_config(config, args):
    config.defrost()
    # set cfg using yaml config file
    config.merge_from_file(args.yaml_file)
    # update cfg using args
    config.merge_from_list(args.opts)
    config.freeze()
