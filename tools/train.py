"""Train launcher.

CLI-compatible with /root/reference/tools/train.py:36-82:
  python tools/train.py --cfg configs/trainzju_valzju.yaml [k v ...]

Differences by design: distributed setup is jax.distributed (ICI/DCN mesh)
instead of NCCL process groups (reference :100-150); the per-rank logger bug
at reference :236 (NameError on nonzero ranks) is not reproduced.
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gpnerf_tpu.config import cfg, update_config  # noqa: E402


def parse_args():
    parser = argparse.ArgumentParser(description="GP-NeRF TPU training")
    parser.add_argument(
        "--cfg", dest="yaml_file", required=True,
        help="experiment config file", type=str,
    )
    parser.add_argument(
        "opts", help="modify config via dotted key/value pairs",
        default=None, nargs=argparse.REMAINDER,
    )
    return parser.parse_args()


def init_multihost():
    """Multi-host rendezvous (replaces the reference's SLURM-nodelist ->
    tcp:// NCCL process group, tools/train.py:85-91,116-131). On TPU pods
    jax.distributed.initialize() autodetects; generic clusters provide
    GPNERF_COORDINATOR / GPNERF_NUM_PROCESSES / GPNERF_PROCESS_ID (or the
    SLURM variables jax already understands)."""
    import jax

    coord = os.environ.get("GPNERF_COORDINATOR")
    nproc = os.environ.get("GPNERF_NUM_PROCESSES")
    pid = os.environ.get("GPNERF_PROCESS_ID")
    if coord and nproc:
        jax.distributed.initialize(coord, int(nproc), int(pid or 0))
    elif os.environ.get("SLURM_NTASKS", "1") not in ("", "1"):
        jax.distributed.initialize()


def main():
    args = parse_args()
    update_config(cfg, args)

    # platform must be selected before any device use
    from gpnerf_tpu.utils.platform import select_platform

    select_platform(cfg.device)
    init_multihost()

    import jax

    from gpnerf_tpu.data.loader import DataLoader, build_batchsampler
    from gpnerf_tpu.registry import get
    from gpnerf_tpu.train.checkpoint import load_checkpoint
    from gpnerf_tpu.train.step import make_optimizer
    from gpnerf_tpu.utils.logging_utils import create_logger

    rank = jax.process_index()
    world = jax.process_count()
    seed = cfg.seed + rank
    random.seed(seed)
    np.random.seed(seed)

    logger, log_dir = create_logger(cfg, rank=rank, phase="train")
    logger.info(f"devices: {jax.devices()} process {rank}/{world}")
    logger.info(str(cfg))

    # build model + renderer (config-driven registry, reference :143)
    render = get("render", cfg.render.file)(cfg)
    criterion = get("criterion", cfg.train.criterion_file)(cfg)

    # datasets + loaders (reference :174-204)
    build_dataset_tr = get("dataset", cfg.dataset.train.file)
    build_dataset_te = get("dataset", cfg.dataset.test.file)
    train_dataset = build_dataset_tr(cfg, is_train=True)
    eval_dataset = build_dataset_te(cfg, is_train=False)
    is_distributed = world > 1
    # one frame per local device per optimizer step (img_num_per_gpu=1 per
    # device, like the reference's DDP; local devices fan out via shard_map)
    want_dp = cfg.tpu.dp_size if cfg.tpu.dp_size > 0 else len(jax.local_devices())
    local_dp = max(1, min(want_dp, len(jax.local_devices())))
    train_bs = build_batchsampler(
        cfg, train_dataset, is_distributed,
        cfg.dataset.img_num_per_gpu * local_dp, True,
        num_replicas=world, rank=rank,
    )
    eval_bs = build_batchsampler(
        cfg, eval_dataset, False, cfg.dataset.img_num_per_gpu, False
    )
    # cfg.workers parallel __getitem__ processes (the reference's DataLoader
    # workers, tools/train.py:187-204); eval keeps the thread prefetcher
    train_loader = DataLoader(train_dataset, train_bs, num_workers=cfg.workers)
    eval_loader = DataLoader(eval_dataset, eval_bs)

    # init model variables from a sample batch
    sample = train_dataset[0]
    variables = render.init_variables(int(seed), sample)
    # the trainer's step rng CAN live on the accelerator (it is consumed
    # by the jitted train step); created on host cpu to avoid an eager
    # accelerator dispatch before the first step
    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        rng = jax.random.PRNGKey(seed)
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables))
    logger.info(f"total parameters: {n_params}")

    optimizer, schedule = make_optimizer(cfg)
    from gpnerf_tpu.train.step import split_variables

    params, _ = split_variables(variables)
    opt_state = optimizer.init(params)

    variables, opt_state, last_iter = load_checkpoint(
        cfg, variables, opt_state, cfg.head.sigma.n_layers
    )

    Trainer = get("trainer", cfg.train.file)
    trainer = Trainer(
        cfg,
        render=render,
        criterion=criterion,
        optimizer=optimizer,
        lr_schedule=schedule,
        logger=logger,
        log_dir=cfg.log_dir,
        performance_indicator=cfg.pi,
        last_iter=last_iter,
        rank=rank,
        variables=variables,
        opt_state=opt_state,
        rng=rng,
    )

    while True:
        trainer.train(train_loader, eval_loader)


if __name__ == "__main__":
    main()
