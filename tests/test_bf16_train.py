"""Mixed-precision training (cfg.tpu.train_dtype='bfloat16'): f32 master
params with bf16 module compute must produce gradients aligned with the f32
gradients (catastrophic-breakage guard: NaNs, dtype leaks, sign flips).
Step-by-step loss-curve parity is chaotic after the first update (the
trajectories separate), so curve-level evidence lives in the TPU 60-iter
measurement recorded in PROGRESS.md, not in CI."""

import jax
import numpy as np
import pytest

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.registry import get
from gpnerf_tpu.train.step import split_variables


def _grads_and_loss(train_dtype):
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.encoder.name = "tiny"  # precision mechanics, not depth: fast compile
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 16
    cfg.train.n_rays = 256
    cfg.train.n_samples = 8
    cfg.tpu.train_dtype = train_dtype
    cfg.tpu.eval_ray_cap = 4096
    cfg.tpu.eval_chunk = 1024
    cfg.freeze()

    # seed BOTH RNGs: the fixture dataset's view selection draws from
    # stdlib random (mirroring ZjumocapDataset.py:310-353), so suite-order
    # state bleed otherwise changes the rendered views and the grad cosine
    import random

    random.seed(0)
    np.random.seed(0)
    ds = get("dataset", cfg.dataset.train.file)(cfg, is_train=True)
    render = get("render", cfg.render.file)(cfg)
    criterion = get("criterion", cfg.train.criterion_file)(cfg)
    variables = render.init_variables(jax.random.PRNGKey(0), ds[0])
    params, batch_stats = split_variables(variables)

    def loss_fn(p):
        v = {
            "encoder": {"params": p["encoder"]},
            "head": {"params": p["head"], "batch_stats": batch_stats},
        }
        ret, _ = render.render_train(
            v, {k: jax.numpy.asarray(x) for k, x in ds[0].items()},
            jax.random.PRNGKey(7),
        )
        return sum(criterion(ret, {k: jax.numpy.asarray(x) for k, x in ds[0].items()}, True).values())

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    flat = np.concatenate(
        [np.asarray(g, np.float64).ravel() for g in jax.tree.leaves(grads)]
    )
    assert all(g.dtype == np.float32 for g in jax.tree.leaves(grads))
    return float(loss), flat


@pytest.mark.slow
def test_bf16_grads_align_with_f32():
    """Catastrophic-breakage guard only: at RANDOM init the encoder's
    gradient direction is noise-dominated (InstanceNorm true-zero bias grads
    etc.), so tight alignment is not assertable here. Measured on the
    TRAINED checkpoint (CPU, 256 rays): grad cosine 0.77, loss within 16%;
    60-iter TPU curve parity is recorded in PROGRESS.md."""
    l32, g32 = _grads_and_loss("float32")
    l16, g16 = _grads_and_loss("bfloat16")
    assert np.isfinite(l16) and np.isfinite(g16).all()
    # same order of magnitude: forward and gradient not broken
    assert abs(l16 - l32) < 0.5 * abs(l32) + 1e-4, (l32, l16)
    n32, n16 = np.linalg.norm(g32), np.linalg.norm(g16)
    assert 0.2 < n16 / n32 < 5.0, (n32, n16)
    cos = float(g32 @ g16 / (n32 * n16 + 1e-30))
    assert cos > 0.2, cos
