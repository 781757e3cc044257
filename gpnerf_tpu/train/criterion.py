"""Training criterion.

Twin of /root/reference/libs/criterions/BaseNeRFCriterion.py:35-57: the live
loss is a plain MSE on rgb over the mask_at_box rays — the focal/alpha
plumbing there is dead code and is not ported. With static ray padding the
selection becomes a validity-weighted mean.
"""

from __future__ import annotations

import jax.numpy as jnp

from gpnerf_tpu.registry import register


class Criterion:
    def __init__(self, cfg):
        self.cfg = cfg

    def __call__(self, ret, batch, is_train=True):
        valid = batch["ray_valid"]
        diff = (ret["rgb_map"] - batch["rgb"]) ** 2
        n = jnp.maximum(valid.sum(), 1.0)
        rgb_loss = (diff * valid[:, None]).sum() / (n * diff.shape[-1])
        return {"rgb_loss": rgb_loss}


def build_criterion(cfg):
    return Criterion(cfg)


register("criterion", "BaseNeRFCriterion", build_criterion)
