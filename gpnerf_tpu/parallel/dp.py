"""Data parallelism over a device mesh.

Replaces the reference's NCCL DistributedDataParallel stack
(/root/reference/tools/train.py:116-150, libs/utils/misc.py:136-160,
libs/datasets/samplers.py:86-142) with `jax.shard_map` over a
`jax.sharding.Mesh`: parameters and optimizer state are replicated, each
device consumes one frame-batch (img_num_per_gpu=1, like the reference),
gradients are `pmean`ed over ICI inside the compiled step (DDP's backward
allreduce), and loss logging rides the same reduction (`reduce_dict`).

One deliberate improvement over DDP: BatchNorm running statistics are also
pmean-synchronized (the reference leaves ranks' BN stats divergent and saves
rank 0's).

Multi-host: the same program runs under jax.distributed with the mesh laid
over all processes' devices; per-process data sharding comes from
DistributedSampler (gpnerf_tpu.data.loader).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P


def make_mesh(n_devices: int = -1, axis: str = "dp") -> Mesh:
    devices = jax.devices()
    if n_devices == -1:
        n_devices = len(devices)
    return Mesh(devices[:n_devices], (axis,))


def stack_batches(batches):
    """Stack per-device frame batches on a new leading axis."""
    import numpy as np

    return {
        k: np.stack([np.asarray(b[k]) for b in batches]) for k in batches[0]
    }


def make_dp_train_step(renderer, criterion, optimizer, mesh, axis: str = "dp"):
    """Compiled DP train step.

    Call signature: (params, batch_stats, opt_state, batches, rngs) where
    `batches` is a frame-batch dict stacked on a leading device axis of size
    mesh.shape[axis] and `rngs` is (n_devices, 2) PRNG keys.
    """

    def device_fn(params, batch_stats, opt_state, batch, rng):
        # strip the local leading shard axis (length 1 per device)
        batch = jax.tree.map(lambda x: x[0], batch)
        rng = rng[0]

        def loss_fn(p, bs):
            variables = {
                "encoder": {"params": p["encoder"]},
                "head": {"params": p["head"], "batch_stats": bs},
            }
            ret, new_bs = renderer.render_train(variables, batch, rng)
            loss_dict = criterion(ret, batch, is_train=True)
            return sum(loss_dict.values()), (loss_dict, new_bs, ret)

        (total, (loss_dict, new_bs, ret)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats)

        # DDP-equivalent gradient allreduce over ICI
        grads = jax.lax.pmean(grads, axis)
        new_bs = jax.lax.pmean(new_bs, axis)
        metrics = jax.lax.pmean(
            {**loss_dict, "loss": total, "overflow": ret["overflows"].max().astype(jnp.float32)},
            axis,
        )
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_bs, opt_state, metrics

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0, 1, 2))


def make_dp_eval_render(renderer, mesh, axis: str = "dp"):
    """Shard a full-image eval render's ray chunks across the mesh: every
    device builds the (small) volume, rays split over devices — the
    TPU-native analog of the reference's ray chunking (BaseRender.py:160-184)
    scaled across chips."""

    def device_fn(variables, batch, rays):
        ro, rd, nr, fr = (
            rays["ray_o"][0],
            rays["ray_d"][0],
            rays["near"][0],
            rays["far"][0],
        )
        from gpnerf_tpu.render.base import src_norm

        src = src_norm(batch["src_imgs"])
        featmaps = renderer.encoder.apply(variables["encoder"], src)
        src_unnorm = src * 0.5 + 0.5
        pre = renderer.prepare_frame(batch, featmaps, neg_ray=renderer.neg_ray_val)
        level_feats = renderer.nerfhead.apply(
            variables["head"],
            pre["smpl_feat"],
            pre["vertex_rows"],
            pre["grids"],
            train=False,
            method="volume",
        )
        query_ctx = renderer.sparse_query_ctx(level_feats, pre["grids"])
        out = renderer.render_chunk(
            variables["head"], query_ctx, pre, batch, src_unnorm, featmaps,
            ro, rd, nr, fr, neg_ray=renderer.neg_ray_val, perturb=False,
        )
        return {"rgb_map": out["rgb_map"][None], "acc_map": out["acc_map"][None]}

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
        check_vma=False,
    )

    @jax.jit
    def run(variables, batch):
        n_dev = mesh.shape[axis]
        cap = batch["ray_o"].shape[0]
        assert cap % n_dev == 0
        rays = {
            k: batch[k].reshape(n_dev, cap // n_dev, *batch[k].shape[1:])
            for k in ("ray_o", "ray_d", "near", "far")
        }
        out = sharded(variables, batch, rays)
        return {k: v.reshape(cap, *v.shape[2:]) for k, v in out.items()}

    return run


def make_dp_demo_render(renderer, mesh, axis: str = "dp"):
    """Shard the PROGRESSIVE renderer's per-ray pipeline across the mesh.

    Each device replicates the cheap frame stage (volume, occupancy, packed
    gather tables, ray extraction — deterministic, identical on every chip)
    and runs the expensive per-point pipeline (occupancy taps, K-slot
    compaction, projection gathers, density/color MLPs, composite) on its
    1/N slice of the ray set; per-point capacities scale with the slice
    (render/demo.Renderer._ray_pipeline). The composited ray colors ride
    the mesh back as the shard_map output — the progressive analog of the
    reference's single-GPU demo_render, scaled over ICI.
    """
    n_dev = mesh.shape[axis]
    assert renderer.ray_cap % n_dev == 0, (renderer.ray_cap, n_dev)
    sl = renderer.ray_cap // n_dev

    def device_fn(variables, batch):
        from gpnerf_tpu.render.base import src_norm

        featmaps = renderer.encoder.apply(
            variables["encoder"], src_norm(batch["src_imgs"])
        )
        out = renderer._frame_stage(variables, batch, featmaps)
        pre, tables, rd = out
        i = jax.lax.axis_index(axis)
        start = i * sl

        def sl1(x):
            return jax.lax.dynamic_slice_in_dim(x, start, sl, axis=0)

        rgb_map, stats = renderer._ray_pipeline(
            variables["head"], batch, pre, tables,
            sl1(rd["rays_o"]), sl1(rd["rays_d"]), sl1(rd["near"]),
            sl1(rd["far"]), sl1(rd["ray_ok"]), zmin=sl1(rd["zmin"]),
            bins=None if rd.get("bins") is None else sl1(rd["bins"]),
        )
        # per-shard counters SUM across the mesh (each shard counts its own
        # slice of rays/points); ray_overflow comes from the replicated
        # frame stage and is taken locally — dividing a psum by n_dev here
        # would under-report real per-slice overflows by the mesh size
        per_shard = jnp.stack(
            [
                jnp.int32(0),
                stats["perray_overflow"],
                stats["sig_overflow"],
                jnp.int32(0),
            ]
        )
        overflows = jax.lax.psum(per_shard, axis).at[0].set(rd["ray_overflow"])
        return (
            rgb_map[None],
            sl1(rd["pix_idx"])[None],
            sl1(rd["ray_ok"])[None],
            overflows[None],
        )

    sharded = jax.shard_map(
        device_fn,
        mesh=mesh,
        in_specs=(P(), P()),
        out_specs=(P(axis), P(axis), P(axis), P(axis)),
        check_vma=False,
    )

    @jax.jit
    def run(variables, batch):
        rgb, pix_idx, ray_ok, overflows = sharded(variables, batch)
        cap = renderer.ray_cap
        rgb = rgb.reshape(cap, 3)
        pix_idx = pix_idx.reshape(cap)
        ray_ok = ray_ok.reshape(cap)
        Himg, Wimg = batch["tar_img"].shape[0:2]
        oob = Himg * Wimg
        tgt_pix = jnp.where(ray_ok, pix_idx, oob)
        pred_chw = jnp.stack(
            [
                jnp.zeros((oob,)).at[tgt_pix].set(rgb[:, c], mode="drop")
                for c in range(3)
            ]
        ).reshape(3, Himg, Wimg)
        mask_flat = (
            jnp.zeros((oob,), bool)
            .at[tgt_pix]
            .set(True, mode="drop")
        )
        return {
            "rgb_map": rgb,
            "pred_chw": pred_chw,
            "mask_at_box": mask_flat,
            "ray_ok": ray_ok,
            "overflows": overflows[0],
        }

    return run
