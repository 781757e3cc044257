"""Image-quality evaluator (PSNR / SSIM / MSE).

Twin of /root/reference/libs/evaluators/if_nerf.py:7-83: PSNR =
-10*log10(mse) over the mask_at_box pixels, SSIM over the bounding-rect crop
of the reassembled image (skimage-compatible, see gpnerf_tpu.ops.ssim),
optional side-by-side gt|pred JPEG dumps, and `summarize` printing means and
saving `results/<seq>/metrics.npy` (the mse list, matching if_nerf.py:76).
"""

from __future__ import annotations

import os

import numpy as np

from gpnerf_tpu.ops.image import bounding_rect, imwrite
from gpnerf_tpu.ops.ssim import compare_ssim


def scatter_rays_to_image(rgb_rows, mask_flat, H, W):
    """Place per-ray values into the image at the mask pixels (scan order).
    Rays are padded/truncated to a static cap, so only min(n_rows, n_mask)
    leading mask pixels are written."""
    img = np.zeros((H * W, 3))
    idx = np.flatnonzero(mask_flat.reshape(-1))
    n = min(len(idx), len(rgb_rows))
    img[idx[:n]] = rgb_rows[:n]
    return img.reshape(H, W, 3)


class Evaluator:
    def __init__(self, cfg, seq_name):
        self.mse = []
        self.psnr = []
        self.ssim = []
        self.cfg = cfg
        self.seq_name = seq_name

    @staticmethod
    def psnr_metric(img_pred, img_gt):
        mse = np.mean((img_pred - img_gt) ** 2)
        return -10 * np.log(mse) / np.log(10)

    def ssim_metric(self, rgb_pred, rgb_gt, batch, save=True):
        mask_at_box = np.asarray(batch["mask_at_box"])
        H, W = int(self.cfg.dataset.H * self.cfg.dataset.ratio), int(
            self.cfg.dataset.W * self.cfg.dataset.ratio
        )
        mask_at_box = mask_at_box.reshape(H, W)
        img_pred = scatter_rays_to_image(rgb_pred, mask_at_box, H, W)
        img_gt = scatter_rays_to_image(rgb_gt, mask_at_box, H, W)

        if self.cfg.test.save_imgs and save:
            img = np.concatenate((img_gt, img_pred), axis=1)
            path = os.path.join(self.cfg.result_dir, self.seq_name)
            os.makedirs(path, exist_ok=True)
            name = (
                str(int(batch["frame_index"]))
                + "_cam"
                + str(int(batch["cam_ind"]))
                + ".jpg"
            )
            imwrite(os.path.join(path, name), np.clip(img, 0, 1))

        x, y, w, h = bounding_rect(mask_at_box.astype(np.uint8))
        return compare_ssim(
            img_pred[y : y + h, x : x + w], img_gt[y : y + h, x : x + w],
            multichannel=True,
        )

    def evaluate(self, output, batch):
        """output/batch: per-ray predictions over the padded box rays. The
        valid prefix (ray_valid) holds the mask_at_box pixels in scan order
        (if_nerf.py:49-66 uses rgb_map / pred_img the same way)."""
        n = int(np.asarray(batch["n_rays"]))
        if "pred_img" in output or "pred_chw" in output:
            from gpnerf_tpu.render.demo import pred_img_hwc

            H, W = int(self.cfg.dataset.H * self.cfg.dataset.ratio), int(
                self.cfg.dataset.W * self.cfg.dataset.ratio
            )
            mask = np.asarray(batch["mask_at_box"]).reshape(H, W)
            rgb_pred = pred_img_hwc(output)[mask][:n]
            rgb_gt = np.asarray(batch["rgb"])[:n]
        else:
            rgb_pred = np.asarray(output["rgb_map"])[:n]
            rgb_gt = np.asarray(batch["rgb"])[:n]

        mse = np.mean((rgb_pred - rgb_gt) ** 2)
        self.mse.append(mse)
        self.psnr.append(self.psnr_metric(rgb_pred, rgb_gt))
        self.ssim.append(self.ssim_metric(rgb_pred, rgb_gt, batch))

    def summarize(self):
        result_path = os.path.join(self.cfg.result_dir, self.seq_name, "metrics.npy")
        os.makedirs(os.path.dirname(result_path), exist_ok=True)
        metrics = {
            "mse": float(np.mean(self.mse)),
            "psnr": float(np.mean(self.psnr)),
            "ssim": float(np.mean(self.ssim)),
        }
        np.save(result_path, self.mse)
        print("mse: {}".format(metrics["mse"]))
        print("psnr: {}".format(metrics["psnr"]))
        print("ssim: {}".format(metrics["ssim"]))
        self.mse, self.psnr, self.ssim = [], [], []
        return metrics
