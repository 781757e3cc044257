"""Checkpoint save/load.

On-disk format matches the reference (BaseTrainer.py:168-191 /
utils.py:77-166): a torch pickle with {'epoch', 'model',
'performance/psnr', 'state_dict', 'optimizer'}; `model_best.pth` holds the
bare state_dict. `state_dict` uses the reference's torch key layout (see
torch_interop) so checkpoints are interchangeable; the optimizer entry holds
our optax state (a torch-tensor-free numpy pytree — a torch optimizer cannot
resume from it, and vice versa, which matches the reference's own behavior
of skipping incompatible optimizer states).
"""

from __future__ import annotations

import logging
import os

import jax
import numpy as np
import torch

from gpnerf_tpu.train.torch_interop import (
    torch_state_to_variables,
    variables_to_torch_state,
)


def save_checkpoint(states, is_best, output_dir, filename="checkpoint.pth"):
    """(utils.py:160-166)."""
    os.makedirs(output_dir, exist_ok=True)
    torch.save(states, os.path.join(output_dir, filename))
    logging.info(f"save model to {output_dir}")
    if is_best:
        torch.save(states["state_dict"], os.path.join(output_dir, "model_best.pth"))


def pack_state(variables, n_layers=4):
    """variables pytree -> torch state_dict (torch tensors)."""
    return {
        k: torch.from_numpy(np.ascontiguousarray(v))
        for k, v in variables_to_torch_state(variables, n_layers).items()
    }


def unpack_state(state_dict, variables_template, n_layers=4, strict=True):
    return torch_state_to_variables(
        state_dict, variables_template, n_layers, strict=strict
    )


def optax_to_numpy(opt_state):
    return jax.tree.map(lambda x: np.asarray(x), opt_state)


def numpy_to_optax(template, loaded):
    flat_t, treedef = jax.tree.flatten(template)
    flat_l = jax.tree.leaves(loaded)
    assert len(flat_t) == len(flat_l), "optimizer state structure mismatch"
    import jax.numpy as jnp

    return jax.tree.unflatten(treedef, [jnp.asarray(v) for v in flat_l])


def load_checkpoint(cfg, variables, opt_state, n_layers=4):
    """Resume logic (utils.py:77-122): returns (variables, opt_state,
    last_epoch). Raises FileNotFoundError on a configured-but-missing path."""
    last_epoch = -1
    resume_path = cfg.render.resume_path
    if resume_path and cfg.train.resume:
        if os.path.exists(resume_path):
            ckpt = torch.load(resume_path, map_location="cpu", weights_only=False)
            state = ckpt.get("state_dict", ckpt)
            variables = unpack_state(state, variables, n_layers, strict=False)
            logging.info(f"==> model pretrained from {resume_path}")
            if isinstance(ckpt, dict) and "optimizer" in ckpt and opt_state is not None:
                try:
                    opt_state = numpy_to_optax(opt_state, ckpt["optimizer"])
                    logging.info("==> optimizer resumed, continue training")
                except Exception as e:  # torch optimizers are not resumable here
                    logging.warning(f"==> optimizer state not resumable: {e}")
            if isinstance(ckpt, dict) and "epoch" in ckpt:
                last_epoch = int(ckpt["epoch"])
                logging.info(f"==> last_epoch = {last_epoch}")
        else:
            logging.error(f'==> checkpoint do not exists: "{resume_path}"')
            raise FileNotFoundError(resume_path)
    else:
        logging.info("==> train model without resume")
    return variables, opt_state, last_epoch


def load_eval_model(resume_path, variables, n_layers=4):
    """(utils.py:169-181): strict load of a trained model for inference."""
    if resume_path != "":
        if os.path.exists(resume_path):
            print(f"==> model load from {resume_path}")
            ckpt = torch.load(resume_path, map_location="cpu", weights_only=False)
            state = (
                ckpt["state_dict"]
                if isinstance(ckpt, dict) and "state_dict" in ckpt
                else ckpt
            )
            variables = unpack_state(state, variables, n_layers, strict=True)
        else:
            print(f'==> checkpoint do not exists: "{resume_path}"')
            raise FileNotFoundError(resume_path)
    return variables
