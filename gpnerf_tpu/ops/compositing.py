"""Volume-rendering alpha compositing.

Reproduces the reference's `raw2outputs` exactly
(/root/reference/libs/renders/BaseRender.py:75-107): distance-free opacity
``alpha = 1 - exp(-sigma)`` (NO `dists` factor), shifted-cumprod
transmittance with the 1e-10 stabilizer, and the >=8-valid-samples ray mask.
The `neg` flag flips the sample order for THuman's flipped ray
parameterization (BaseRender.py:86-88).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CompositeOutput(NamedTuple):
    rgb_map: jnp.ndarray  # (N_rays, 3)
    disp_map: jnp.ndarray  # (N_rays,)
    acc_map: jnp.ndarray  # (N_rays,)
    weights: jnp.ndarray  # (N_rays, N_samples)
    depth_map: jnp.ndarray  # (N_rays,)
    mask: jnp.ndarray  # (N_rays,) bool
    alpha: jnp.ndarray  # (N_rays, N_samples)


def sigma2alpha(sigma):
    """Distance-free opacity (BaseRender.py:90-91)."""
    return 1.0 - jnp.exp(-sigma)


def shifted_transmittance(alpha):
    """T_i = prod_{j<i} (1 - alpha_j + 1e-10) with T_0 = 1
    (BaseRender.py:94-95)."""
    T = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)[..., :-1]
    return jnp.concatenate([jnp.ones_like(T[..., 0:1]), T], axis=-1)


def raw2outputs(raw, z_vals, pixel_mask, neg=False):
    """Composite raw per-sample (rgb, sigma) into per-ray outputs.

    Args:
      raw: (N_rays, N_samples, 4) — rgb in [..., :3], sigma in [..., 3].
      z_vals: (N_rays, N_samples) sample depths.
      pixel_mask: (N_rays, N_samples) count-source mask; a ray is valid when
        more than 8 samples have >=2 in-front in-bound source views
        (BaseRender.py:105,139).
      neg: flip sample order (THuman rays; BaseRender.py:86-88).
    """
    rgb = raw[:, :, :3]
    sigma = raw[:, :, 3]

    if neg:
        rgb = jnp.flip(rgb, axis=1)
        sigma = jnp.flip(sigma, axis=1)

    alpha = sigma2alpha(sigma)
    T = shifted_transmittance(alpha)
    weights = alpha * T

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    # the reference's disp is NaN for empty rays (0/0 through torch.max,
    # BaseRender.py:101-103); guard the denominator since disp is unused by
    # losses/metrics and NaNs poison finite-checks
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / jnp.maximum(acc_map, 1e-10))
    mask = pixel_mask.astype(jnp.float32).sum(axis=1) > 8

    return CompositeOutput(rgb_map, disp_map, acc_map, weights, depth_map, mask, alpha)


def composite_scattered(rgb, alpha, n_rays, n_samples):
    """Progressive-renderer compositing on pre-scattered dense buffers
    (demo_render.py:334-353): rgb (n_rays*n_samples, 3) and alpha
    (n_rays*n_samples,) already scattered back from the culled point set.
    Returns rgb_map (n_rays, 3) and weights (n_rays, n_samples)."""
    rgb = rgb.reshape(n_rays, n_samples, 3)
    alpha = alpha.reshape(n_rays, n_samples)
    T = shifted_transmittance(alpha)
    weights = alpha * T
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=1)
    return rgb_map, weights
