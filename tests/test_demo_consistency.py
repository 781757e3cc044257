"""Progressive renderer vs BaseRender consistency.

The demo path reorders computation (culling, compaction, scatter-composite)
but must reproduce the same image where it renders: with BN statistics
warmed (occupancy meaningful) the two renderers' pixels should agree
closely on the demo's covered set. Guards against compaction/scatter
regressions like the overflow truncation bug."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.registry import get


@pytest.mark.slow
def test_demo_matches_base_on_covered_pixels():
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 16
    cfg.render.file = "demo_render"
    cfg.tpu.matmul_dtype = "float32"  # numerical comparison
    cfg.tpu.ray_cap = 16384
    cfg.tpu.sigma_cap = 262144
    cfg.tpu.rgb_cap = 131072
    cfg.tpu.eval_ray_cap = 16384
    cfg.tpu.eval_chunk = 4096
    cfg.freeze()

    np.random.seed(0)
    ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    demo = get("render", "demo_render")(cfg)
    base = get("render", "BaseRender")(cfg)
    b = ds[0]
    variables = demo.init_variables(jax.random.PRNGKey(0), b)
    batch = {k: jnp.asarray(v) for k, v in b.items()}

    # warm BN stats so the occupancy field is meaningful
    featmaps = demo.encoder.apply(variables["encoder"], batch["src_imgs"])
    pre = demo.prepare_frame(batch, featmaps)
    hv = variables["head"]
    for _ in range(20):
        _, mut = demo.nerfhead.apply(
            hv, pre["smpl_feat"], pre["vertex_rows"], pre["grids"],
            train=True, method=lambda m, *a, **k: m.volume(*a, **k),
            mutable=["batch_stats"],
        )
        hv = {"params": hv["params"], **mut}
    variables = {"encoder": variables["encoder"], "head": hv}

    dret = demo.render_demo_fn()(variables, batch)
    assert int(np.asarray(dret["overflows"]).max()) == 0

    bret = base.render_eval_fn()(variables, batch)
    H, W = 128, 128
    base_img = np.zeros((H * W, 3))
    idx = np.flatnonzero(np.asarray(b["mask_at_box"]))
    n = int(b["n_rays"])
    base_img[idx[:n]] = np.asarray(bret["rgb_map"])[:n]
    base_img = base_img.reshape(H, W, 3)

    demo_img = np.asarray(dret["pred_img"])
    covered = np.asarray(dret["mask_at_box"]).reshape(H, W) & np.asarray(
        b["mask_at_box"]
    ).reshape(H, W)
    assert covered.sum() > 200, "demo should cover body pixels"

    diff = np.abs(demo_img[covered] - base_img[covered])
    # With untrained weights the culled samples carry random (not near-zero)
    # density, capping achievable agreement — this guards against gross
    # regressions (wrong pixels/geometry/compaction), not numerics. Trained-
    # weights parity is validated on TPU: full-test-set PSNR 22.46 (demo) vs
    # 22.82 (BaseRender), see PROGRESS.md.
    assert np.median(diff) < 0.02, float(np.median(diff))
    assert (diff.max(axis=-1) < 0.1).mean() > 0.5, float(
        (diff.max(axis=-1) < 0.1).mean()
    )
