"""Inference / evaluation launcher.

CLI-compatible with /root/reference/tools/inference.py:28-105:
  python tools/inference.py --cfg configs/trainzju_valzju.yaml \
      render.file demo_render render.resume_path <ckpt> \
      dataset.test.sampler 'FrameSampler' dataset.test.shuffle False
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
    parser = argparse.ArgumentParser(description="GP-NeRF TPU inference")
    parser.add_argument("--cfg", dest="yaml_file", required=True, type=str)
    parser.add_argument("opts", default=None, nargs=argparse.REMAINDER)
    return parser.parse_args()


def main():
    args = parse_args()
    update_config(cfg, args)

    from gpnerf_tpu.utils.platform import select_platform

    select_platform(cfg.device)

    import jax

    from gpnerf_tpu.data.loader import DataLoader, build_batchsampler
    from gpnerf_tpu.registry import get
    from gpnerf_tpu.train.checkpoint import load_eval_model
    from gpnerf_tpu.utils.logging_utils import create_logger

    seed = cfg.seed
    random.seed(seed)
    np.random.seed(seed)
    logger, _ = create_logger(cfg, rank=0, phase="eval")

    render = get("render", cfg.render.file)(cfg)
    render.is_train = False

    eval_dataset = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    eval_bs = build_batchsampler(
        cfg, eval_dataset, False, cfg.dataset.img_num_per_gpu, False
    )
    eval_loader = DataLoader(eval_dataset, eval_bs)

    variables = render.init_variables(int(seed), eval_dataset[0])
    variables = load_eval_model(
        cfg.render.resume_path, variables, cfg.head.sigma.n_layers
    )

    Trainer = get("trainer", cfg.train.file)
    trainer = Trainer(
        cfg,
        render=render,
        criterion=None,
        optimizer=None,
        lr_schedule=None,
        logger=logger,
        log_dir=None,
        performance_indicator=cfg.pi,
        rank=0,
        variables=variables,
    )
    if cfg.test.profile and hasattr(render, "profile"):
        # reference-shaped per-stage timing (demo_render.py:97-357
        # time_slots; printed like misc/BaseTrainer's eval harness would)
        import json

        first = None
        for data in eval_loader:
            first = {k: jax.numpy.asarray(v) for k, v in data.items()}
            break
        if first is not None:
            prof = render.profile(variables, first)
            logger.info(
                "time_slots: %s", json.dumps(
                    {k: round(float(v), 4) for k, v in prof["time_slots"].items()}
                )
            )
            logger.info(
                "etime: %.4f rtime: %.4f", prof["etime"], prof["rtime"]
            )

    result_path = os.path.join(cfg.result_dir, cfg.test.test_seq)
    trainer.evaluate(eval_loader, result_path, cfg.test.is_vis)


if __name__ == "__main__":
    main()
