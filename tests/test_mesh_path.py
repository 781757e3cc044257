"""End-to-end mesh extraction: synthetic frame -> sigma grid -> marching
cubes -> exported PLY round-trip; plus the demo renderer's occupancy-driven
mesh branch (no dataset visual hull) parity-checked against the hull path."""

import os

import jax
import numpy as np

from gpnerf_tpu.config import cfg as _cfg
from gpnerf_tpu.registry import get
from gpnerf_tpu.train.mesh_evaluator import MeshEvaluator
from gpnerf_tpu.utils.mesh_io import read_ply


def test_mesh_render_path(tmp_path):
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 16
    cfg.head.rgb.use_rgbhead = False
    cfg.dataset.voxel_size = [0.02, 0.02, 0.02]  # coarse grid: fast test
    cfg.tpu.eval_ray_cap = 4096
    cfg.tpu.eval_chunk = 1024
    cfg.result_dir = str(tmp_path)
    cfg.freeze()

    np.random.seed(0)
    ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    render = get("render", cfg.render.file)(cfg)
    assert render.mesh_th == 1.0 / cfg.test.mesh_th
    b = ds[0]
    assert "pts" in b and "inside" in b
    assert b["inside"].any(), "visual hull empty"
    variables = render.init_variables(jax.random.PRNGKey(0), b)
    out = render.render_mesh(variables, b, chunk=16384)
    cube = out["cube"]
    assert np.isfinite(cube).all()
    assert cube.shape == tuple(np.array(b["pts"].shape[:3]) + 20)  # pad 10

    ev = MeshEvaluator(cfg, "meshtest")
    ev.evaluate(out, b)
    if len(out["mesh"].vertices):
        path = ev.visualize(out, b)
        v, f = read_ply(path)
        np.testing.assert_allclose(v, out["mesh"].vertices, rtol=1e-6)
        assert (f == out["mesh"].faces).all()


def test_demo_mesh_occupancy_driven(tmp_path):
    """Demo mesh branch (demo_render.py:249-268,366-376): grid from the
    occupancy AABB alone — works WITHOUT the dataset's pts/inside visual
    hull, and its thresholded world-space alpha cloud matches the hull
    path's (same trained weights, different grids)."""
    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/synthetic.yaml")
    cfg.dataset.H = 128
    cfg.dataset.W = 128
    cfg.head.sigma.code_dim = 32  # trained checkpoint layout
    cfg.head.rgb.use_rgbhead = False
    cfg.dataset.voxel_size = [0.02, 0.02, 0.02]  # coarse grid: fast test
    cfg.tpu.eval_ray_cap = 4096
    cfg.tpu.eval_chunk = 1024
    cfg.tpu.matmul_dtype = "float32"
    cfg.result_dir = str(tmp_path)
    cfg.freeze()

    np.random.seed(0)
    ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    base = get("render", "BaseRender")(cfg)
    demo = get("render", "demo_render")(cfg)
    b = ds[0]
    variables = base.init_variables(jax.random.PRNGKey(0), b)
    ckpt = os.path.join(os.path.dirname(__file__), "..", "artifacts",
                        "bench_ckpt.pth")
    from gpnerf_tpu.train.checkpoint import load_eval_model

    variables = load_eval_model(ckpt, variables, cfg.head.sigma.n_layers)

    th = base.mesh_th
    hull = base.render_mesh(variables, b, chunk=16384)
    no_hull = {k: v for k, v in b.items() if k not in ("pts", "inside")}
    occ = demo.render_mesh(variables, no_hull, chunk=16384)
    assert np.isfinite(occ["cube"]).all()

    # world-space thresholded alpha clouds (strip the 10-voxel pad)
    hull_alpha = hull["cube"][10:-10, 10:-10, 10:-10]
    hull_pts = np.asarray(b["pts"]).reshape(hull_alpha.shape + (3,))
    cloud_h = hull_pts[hull_alpha > th]
    occ_alpha = occ["cube"][10:-10, 10:-10, 10:-10]
    # demo grid: can_bounds[0] + idx * voxel (world axes, ij meshgrid);
    # recompute the grid origin the same way render_mesh did
    import jax.numpy as jnp

    vol_fn, _ = demo._mesh_fns_demo()
    *_, can_bounds = vol_fn(
        variables, {k: jnp.asarray(v) for k, v in no_hull.items()}
    )
    cb0 = np.asarray(can_bounds)[0]
    idx = np.argwhere(occ_alpha > th)
    cloud_o = cb0[None] + idx * 0.02
    assert len(cloud_h) > 50 and len(cloud_o) > 50, (
        len(cloud_h), len(cloud_o),
    )

    from scipy.spatial import cKDTree

    d_oh = cKDTree(cloud_h).query(cloud_o)[0]
    d_ho = cKDTree(cloud_o).query(cloud_h)[0]
    # same trained density field on 2 differently-aligned 2cm grids: clouds
    # should interleave within ~2 voxels
    assert np.median(d_oh) < 0.04, float(np.median(d_oh))
    assert np.median(d_ho) < 0.04, float(np.median(d_ho))
