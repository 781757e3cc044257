"""Real-data readiness drill (VERDICT r2 #6).

Runs the EXACT published-checkpoint evaluation command
(/root/reference/README.md:73-79, test.sh:2-7) as a subprocess —
`tools/inference.py --cfg configs/trainzju_valzju.yaml render.file
demo_render render.resume_path <ckpt> dataset.test.sampler FrameSampler` —
against the fabricated on-disk ZJU tree and a checkpoint written in the
reference's torch .pth format, so the only step never exercised in this
environment is the real dataset bytes themselves. See README "Real-data
drill" for the production command.
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest

@pytest.mark.slow
def test_published_checkpoint_eval_command(tmp_path, zju_root):
    root = zju_root

    # write a checkpoint in the reference's exact .pth layout (the same
    # reader ingests the published cam3zju_zjuval_70.pth; cross-validated
    # against the real reference modules in test_torch_interop_reference)
    from gpnerf_tpu.config import cfg as _cfg
    from gpnerf_tpu.registry import get
    from gpnerf_tpu.train.checkpoint import pack_state, save_checkpoint

    cfg = _cfg.clone()
    cfg.defrost()
    cfg.merge_from_file("configs/trainzju_valzju.yaml")
    cfg.dataset.test.data_root = str(root)
    cfg.dataset.test.seq_list = ["CoreView_387"]
    cfg.dataset.ratio = 0.125
    cfg.freeze()
    np.random.seed(0)
    ds = get("dataset", cfg.dataset.test.file)(cfg, is_train=False)
    render = get("render", "demo_render")(cfg)
    variables = render.init_variables(jax.random.PRNGKey(0), ds[0])
    save_checkpoint(
        {
            "epoch": 70,
            "model": "demo_render",
            "performance/psnr": 0.0,
            "state_dict": pack_state(variables, cfg.head.sigma.n_layers),
        },
        False,
        str(tmp_path),
        filename="cam3zju_zjuval_70.pth",
    )
    ckpt = os.path.join(str(tmp_path), "cam3zju_zjuval_70.pth")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    )
    out = subprocess.run(
        [
            sys.executable, "tools/inference.py",
            "--cfg", "configs/trainzju_valzju.yaml",
            "render.file", "demo_render",
            "render.resume_path", ckpt,
            "dataset.test.sampler", "FrameSampler",
            "dataset.test.shuffle", "False",
            "dataset.test.data_root", str(root),
            "dataset.test.seq_list", "['CoreView_387']",
            "test.test_seq", "CoreView_387",
            "dataset.ratio", "0.125",
            "device", "cpu",
            "workers", "0",
            "tpu.ray_cap", "8192",
            "tpu.sigma_cap", "65536",
            "tpu.rgb_cap", "32768",
            "result_dir", str(tmp_path / "results"),
            "log_dir", str(tmp_path / "logs") + "/",
        ],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=1500,
    )
    assert out.returncode == 0, out.stdout[-3000:] + out.stderr[-3000:]
    # the reference eval prints mse/psnr/ssim means + avg render time
    assert "psnr:" in out.stdout, out.stdout[-2000:]
    assert "avg total render time" in out.stdout, out.stdout[-2000:]
    # metrics.npy persisted like if_nerf.summarize (if_nerf.py:68-83)
    assert os.path.exists(
        tmp_path / "results" / "CoreView_387" / "metrics.npy"
    )
