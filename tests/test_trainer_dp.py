"""Trainer with data parallelism: one epoch over a 2-device mesh (loader
yields 2-frame lists, shard_map step, pmean'd metrics)."""

import jax
import numpy as np
import pytest

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.data.loader import DataLoader, build_batchsampler
from gpnerf_tpu.registry import get
from gpnerf_tpu.train.step import make_optimizer, split_variables
from gpnerf_tpu.utils.logging_utils import create_logger


@pytest.mark.slow
def test_trainer_dp_epoch(tmp_path):
    assert len(jax.devices()) >= 2
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.encoder.name = "tiny"  # orchestration e2e: trace/compile time, not depth
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 16
    cfg.train.n_rays = 64
    cfg.train.n_samples = 16
    cfg.train.ep_iter = 3
    cfg.train.max_epoch = 2
    cfg.train.val_when_train = False
    cfg.tpu.dp_size = 2
    cfg.tpu.eval_ray_cap = 4096
    cfg.tpu.eval_chunk = 1024
    cfg.log_dir = str(tmp_path / "logs") + "/"
    cfg.result_dir = str(tmp_path / "results")
    cfg.output_dir = "dptest/"
    cfg.freeze()

    np.random.seed(0)
    train_ds = get("dataset", cfg.dataset.train.file)(cfg, is_train=True)
    eval_ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    train_loader = DataLoader(
        train_ds, build_batchsampler(cfg, train_ds, False, cfg.tpu.dp_size, True)
    )
    eval_loader = DataLoader(
        eval_ds, build_batchsampler(cfg, eval_ds, False, 1, False)
    )

    render = get("render", cfg.render.file)(cfg)
    criterion = get("criterion", cfg.train.criterion_file)(cfg)
    rng = jax.random.PRNGKey(0)
    variables = render.init_variables(rng, train_ds[0])
    optimizer, schedule = make_optimizer(cfg)
    params, _ = split_variables(variables)
    opt_state = optimizer.init(params)

    logger, _ = create_logger(cfg, rank=0, phase="dptest")
    Trainer = get("trainer", cfg.train.file)
    trainer = Trainer(
        cfg, render=render, criterion=criterion, optimizer=optimizer,
        lr_schedule=schedule, logger=logger, log_dir=cfg.log_dir,
        variables=variables, opt_state=opt_state, rng=rng,
    )
    assert trainer.dp == 2
    trainer.train(train_loader, eval_loader)
    assert trainer.iter_count == 3
    leaves = jax.tree.leaves(trainer.variables)
    assert all(bool(np.isfinite(np.asarray(x)).all()) for x in leaves)
