"""Variant image evaluator.

Port of /root/reference/libs/evaluators/test_if_nerf.py:1-85 — same
PSNR/SSIM metrics but consuming `output['rgb']` with an optional
`output['mask_at_box']`. The reference never wires this class into a live
code path (only if_nerf and if_nerf_mesh are imported, BaseTrainer.py:15-16);
it is provided for API-surface completeness."""

from __future__ import annotations

import os

import numpy as np

from gpnerf_tpu.ops.image import bounding_rect
from gpnerf_tpu.ops.ssim import compare_ssim
from gpnerf_tpu.train.evaluator import scatter_rays_to_image


class Evaluator:
    def __init__(self, cfg, seq_name="variant"):
        self.cfg = cfg
        self.seq_name = seq_name
        self.mse, self.psnr, self.ssim = [], [], []

    @staticmethod
    def psnr_metric(img_pred, img_gt):
        mse = np.mean((img_pred - img_gt) ** 2)
        return -10 * np.log(mse) / np.log(10)

    def evaluate(self, output, batch):
        rgb_pred = np.asarray(output["rgb"])
        n = int(np.asarray(batch.get("n_rays", len(rgb_pred))))
        rgb_pred = rgb_pred[:n]
        rgb_gt = np.asarray(batch["rgb"])[:n]
        mask = np.asarray(
            output.get("mask_at_box", batch["mask_at_box"])
        )
        H = int(self.cfg.dataset.H * self.cfg.dataset.ratio)
        W = int(self.cfg.dataset.W * self.cfg.dataset.ratio)
        mask = mask.reshape(H, W)

        self.mse.append(float(np.mean((rgb_pred - rgb_gt) ** 2)))
        self.psnr.append(float(self.psnr_metric(rgb_pred, rgb_gt)))
        img_pred = scatter_rays_to_image(rgb_pred, mask, H, W)
        img_gt = scatter_rays_to_image(rgb_gt, mask, H, W)
        x, y, w, h = bounding_rect(mask.astype(np.uint8))
        self.ssim.append(
            compare_ssim(
                img_pred[y : y + h, x : x + w],
                img_gt[y : y + h, x : x + w],
                multichannel=True,
            )
        )

    def summarize(self):
        metrics = {
            "mse": float(np.mean(self.mse)),
            "psnr": float(np.mean(self.psnr)),
            "ssim": float(np.mean(self.ssim)),
        }
        path = os.path.join(self.cfg.result_dir, self.seq_name)
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "metrics.npy"), self.mse)
        for k, v in metrics.items():
            print(f"{k}: {v}")
        self.mse, self.psnr, self.ssim = [], [], []
        return metrics
