"""grid_sample parity vs torch.nn.functional.grid_sample (the reference's
kernel: align_corners=True, padding_mode='zeros')."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gpnerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("shape", [(2, 3, 8, 9), (3, 32, 128, 128)])
def test_grid_sample_2d_matches_torch(seed, shape):
    rng = np.random.default_rng(seed)
    N, C, H, W = shape
    img = rng.standard_normal(shape).astype(np.float32)
    # include in-bounds, out-of-bounds and exactly-on-edge coords
    grid = rng.uniform(-1.4, 1.4, size=(N, 5, 7, 2)).astype(np.float32)
    grid[:, 0, 0] = [-1.0, -1.0]
    grid[:, 0, 1] = [1.0, 1.0]

    ref = F.grid_sample(
        torch.from_numpy(img), torch.from_numpy(grid), align_corners=True
    ).numpy()
    out = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("seed", [0])
def test_grid_sample_3d_matches_torch(seed):
    rng = np.random.default_rng(seed)
    N, C, D, H, W = 1, 4, 6, 7, 8
    vol = rng.standard_normal((N, C, D, H, W)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(N, 3, 4, 5, 3)).astype(np.float32)
    grid[:, 0, 0, 0] = [-1.0, -1.0, -1.0]
    grid[:, 0, 0, 1] = [1.0, 1.0, 1.0]

    ref = F.grid_sample(
        torch.from_numpy(vol),
        torch.from_numpy(grid),
        align_corners=True,
        padding_mode="zeros",
    ).numpy()
    out = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid)))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
