"""Alpha compositing parity vs a torch oracle of the reference's
raw2outputs (/root/reference/libs/renders/BaseRender.py:75-107)."""

import jax.numpy as jnp
import numpy as np
import torch

from gpnerf_tpu.ops.compositing import composite_scattered, raw2outputs


def torch_raw2outputs(raw, z_vals, mask, neg):
    """Line-for-line oracle of the reference formulas (independent impl)."""
    rgb = raw[:, :, :3]
    sigma = raw[:, :, 3]
    if neg:
        rgb = torch.flip(rgb, [1])
        sigma = torch.flip(sigma, [1])
    alpha = 1.0 - torch.exp(-sigma)
    T = torch.cumprod(1.0 - alpha + 1e-10, dim=-1)[:, :-1]
    T = torch.cat((torch.ones_like(T[:, 0:1]), T), dim=-1)
    weights = alpha * T
    rgb_map = torch.sum(weights.unsqueeze(2) * rgb, dim=1)
    depth_map = torch.sum(weights * z_vals, dim=-1)
    disp_map = 1.0 / torch.max(
        1e-10 * torch.ones_like(depth_map), depth_map / torch.sum(weights, -1)
    )
    acc_map = torch.sum(weights, -1)
    ray_mask = mask.float().sum(dim=1) > 8
    return rgb_map, disp_map, acc_map, weights, depth_map, ray_mask, alpha


def test_raw2outputs_matches_reference_formulas():
    rng = np.random.default_rng(0)
    n_rays, n_samples = 37, 64
    raw = rng.uniform(0, 1, size=(n_rays, n_samples, 4)).astype(np.float32)
    z_vals = np.sort(rng.uniform(1, 3, size=(n_rays, n_samples))).astype(np.float32)
    mask = (rng.uniform(size=(n_rays, n_samples)) > 0.3).astype(np.float32)

    for neg in (False, True):
        ref = torch_raw2outputs(
            torch.from_numpy(raw), torch.from_numpy(z_vals), torch.from_numpy(mask), neg
        )
        out = raw2outputs(jnp.asarray(raw), jnp.asarray(z_vals), jnp.asarray(mask), neg=neg)
        np.testing.assert_allclose(np.asarray(out.rgb_map), ref[0].numpy(), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.disp_map), ref[1].numpy(), rtol=2e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.acc_map), ref[2].numpy(), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.weights), ref[3].numpy(), rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out.depth_map), ref[4].numpy(), rtol=2e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(out.mask), ref[5].numpy())


def test_composite_scattered_matches_raw2outputs():
    rng = np.random.default_rng(1)
    n_rays, n_samples = 16, 8
    rgb = rng.uniform(size=(n_rays * n_samples, 3)).astype(np.float32)
    sigma = rng.uniform(size=(n_rays, n_samples)).astype(np.float32)
    alpha = 1.0 - np.exp(-sigma)
    raw = np.concatenate([rgb.reshape(n_rays, n_samples, 3), sigma[..., None]], axis=-1)
    z = np.ones((n_rays, n_samples), np.float32)
    m = np.ones((n_rays, n_samples), np.float32)

    full = raw2outputs(jnp.asarray(raw), jnp.asarray(z), jnp.asarray(m))
    fast_rgb, fast_w = composite_scattered(
        jnp.asarray(rgb), jnp.asarray(alpha.reshape(-1)), n_rays, n_samples
    )
    np.testing.assert_allclose(
        np.asarray(fast_rgb), np.asarray(full.rgb_map), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(fast_w), np.asarray(full.weights), rtol=1e-5, atol=1e-6
    )
