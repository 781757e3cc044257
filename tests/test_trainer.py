"""Trainer end-to-end: two epochs on synthetic data through the full
Trainer (metric logging, quick_val, checkpointing, pruning), then eval."""

import os

import jax
import numpy as np
import pytest

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.data.loader import DataLoader, build_batchsampler
from gpnerf_tpu.registry import get
from gpnerf_tpu.train.step import make_optimizer, split_variables
from gpnerf_tpu.utils.logging_utils import create_logger


@pytest.mark.slow
def test_trainer_two_epochs(tmp_path):
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.encoder.name = "tiny"  # orchestration e2e: trace/compile time, not depth
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 16
    cfg.train.n_rays = 128
    cfg.train.n_samples = 16
    cfg.train.ep_iter = 4
    cfg.train.max_epoch = 3
    cfg.train.valiter_interval = 4
    cfg.train.val_when_train = True
    cfg.tpu.eval_ray_cap = 8192
    cfg.tpu.eval_chunk = 2048
    cfg.log_dir = str(tmp_path / "logs") + "/"
    cfg.result_dir = str(tmp_path / "results")
    cfg.output_dir = "synthtest/"
    cfg.freeze()

    np.random.seed(0)
    train_ds = get("dataset", cfg.dataset.train.file)(cfg, is_train=True)
    eval_ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    train_loader = DataLoader(
        train_ds, build_batchsampler(cfg, train_ds, False, 1, True)
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

    logger, _ = create_logger(cfg, rank=0, phase="test")
    Trainer = get("trainer", cfg.train.file)
    trainer = Trainer(
        cfg,
        render=render,
        criterion=criterion,
        optimizer=optimizer,
        lr_schedule=schedule,
        logger=logger,
        log_dir=cfg.log_dir,
        variables=variables,
        opt_state=opt_state,
        rng=rng,
    )

    trainer.train(train_loader, eval_loader)
    trainer.train(train_loader, eval_loader)
    assert trainer.epoch == 2
    assert trainer.iter_count == 8

    # checkpoints written in the reference layout
    save_dir = os.path.join(cfg.log_dir, cfg.output_dir, cfg.output_dir)
    files = os.listdir(save_dir)
    # reference semantics: epoch 0 is skipped (BaseTrainer.py:154 epoch > 0)
    assert "1.pth" in files and "0.pth" not in files
    assert "model_best.pth" in files  # first quick_val sets best

    # evaluate over the eval loader
    metrics, avg_time = trainer.evaluate(
        eval_loader, str(tmp_path / "evalout"), is_vis=True
    )
    assert metrics is not None
    assert np.isfinite(metrics["psnr"]) and 0 <= metrics["ssim"] <= 1
    assert avg_time > 0
    # visualization images written
    assert any(f.endswith(".jpg") for f in os.listdir(tmp_path / "evalout"))
