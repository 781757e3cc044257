"""End-to-end mesh extraction: synthetic frame -> sigma grid -> marching
cubes -> exported PLY round-trip."""

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
