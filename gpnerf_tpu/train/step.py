"""Jitted optimization step.

Replaces the reference's eager loop body (loss -> backward(retain_graph) ->
optimizer.step, /root/reference/libs/trainers/BaseTrainer.py:117-135) with a
single compiled function: forward + reverse AD + AdamW update fused by XLA.
The reference needed retain_graph because the shared volume crossed chunk
boundaries; here the volume is built inside the same traced step, so the
issue disappears.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax

from gpnerf_tpu.train.lr import exponential_epoch_schedule


def make_optimizer(cfg):
    """AdamW(lr 1e-4, wd 1e-4) + per-epoch exponential decay
    (tools/train.py:216-224, configs/default.py:104-113)."""
    schedule = exponential_epoch_schedule(
        cfg.train.lr, cfg.train.gamma, cfg.train.decay_epochs, cfg.train.ep_iter
    )
    return optax.adamw(schedule, weight_decay=cfg.train.weight_decay), schedule


def split_variables(variables):
    params = {"encoder": variables["encoder"]["params"], "head": variables["head"]["params"]}
    batch_stats = variables["head"].get("batch_stats", {})
    return params, batch_stats


def merge_variables(params, batch_stats):
    return {
        "encoder": {"params": params["encoder"]},
        "head": {"params": params["head"], "batch_stats": batch_stats},
    }


def make_train_step(renderer, criterion, optimizer, *, donate=True):
    def loss_fn(params, batch_stats, batch, rng):
        variables = merge_variables(params, batch_stats)
        ret, new_bs = renderer.render_train(variables, batch, rng)
        loss_dict = criterion(ret, batch, is_train=True)
        total = sum(loss_dict.values())
        return total, (loss_dict, new_bs, ret)

    def step(params, batch_stats, opt_state, batch, rng):
        (total, (loss_dict, new_bs, ret)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params, batch_stats, batch, rng)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        metrics = dict(loss_dict)
        metrics["loss"] = total
        metrics["overflow"] = ret["overflows"].max()
        return params, new_bs, opt_state, metrics

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)
