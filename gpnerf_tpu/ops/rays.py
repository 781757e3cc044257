"""Device-side ray utilities: stratified depth sampling, pixel-grid ray
generation, and ray/AABB intersection.

JAX counterparts of:
  * `Renderer.get_sampling_points` (/root/reference/libs/renders/
    BaseRender.py:35-50) — 64 uniform depth samples in [near, far],
    stratified-jittered in train mode;
  * the demo renderer's device-side ray construction + slab intersection
    (/root/reference/libs/renders/demo_render.py:200-239);
  * host-side `get_rays` / `get_near_far` (/root/reference/libs/datasets/
    data_utils.py:47-63,96-130) have numpy ports in
    `gpnerf_tpu.data.geometry` for the data pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_z_vals(near, far, n_samples, *, perturb, rng=None):
    """Stratified depth samples (BaseRender.py:35-50).

    Args:
      near, far: (...,) per-ray near/far.
      n_samples: static sample count.
      perturb: if True, jitter within strata (train mode).
      rng: jax PRNG key, required when perturb.

    Returns:
      z_vals: (..., n_samples).
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z_vals = near[..., None] * (1.0 - t_vals) + far[..., None] * t_vals
    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def sample_points(ray_o, ray_d, z_vals):
    """pts[i, k] = o_i + d_i * z[i, k]; returns (..., n_samples, 3)."""
    return ray_o[..., None, :] + ray_d[..., None, :] * z_vals[..., None]


def pixel_rays(xy1, K_inv, R, T):
    """World-space rays through pixel centers.

    Matches demo_render.py:200-211 / data_utils.get_rays: camera center
    o = -R^T T; direction d = (K^{-1} [x, y, 1] - T)^T R - o (un-normalized).

    Args:
      xy1: (P, 3) homogeneous pixel coords [x, y, 1].
      K_inv: (3, 3) inverse intrinsics.
      R: (3, 3) world->cam rotation.  T: (3, 1) translation.

    Returns:
      rays_o (P, 3), rays_d (P, 3).
    """
    ori_rays_o = (-R.T @ T).reshape(-1)  # (3,)
    pixel_camera = xy1 @ K_inv.T
    pixel_world = (pixel_camera - T.reshape(1, 3)) @ R
    rays_d = pixel_world - ori_rays_o[None]
    rays_o = jnp.broadcast_to(ori_rays_o, rays_d.shape)
    return rays_o, rays_d


def ray_aabb_near_far(rays_o, rays_d, bounds, *, neg_ray=False, eps=1e-6):
    """Slab intersection of rays with an AABB (demo_render.py:212-239).

    Signs follow the HOST path's semantics (data_utils.get_near_far:96-130,
    also used by BaseRender training batches): both intersection distances
    carry the sign of the first hit's direction, so backward (neg_ray /
    THuman) rays get the correct negative [near, far] span. This is a
    DOCUMENTED deviation from demo_render.py:236-237, which negates only
    d1 — yielding a [−|d1|, +|d0|] span that straddles the camera and
    under-samples the body; that code path is dead in the reference (the
    published protocols evaluate the demo renderer on ZJU only, test.sh)
    and its host-side twin uses the correct signs.

    Args:
      rays_o, rays_d: (P, 3) (rays_d un-normalized).
      bounds: (2, 3) [[min_xyz], [max_xyz]].
      neg_ray: accepted for API compatibility; the signed form above
        subsumes it (kept so call sites document their parameterization).

    Returns:
      near, far: (P,) in units of ||rays_d|| (garbage where invalid),
      mask_at_box: (P,) bool — rays hitting the box exactly twice.
    """
    nominator = bounds[None] - rays_o[:, None]  # (P, 2, 3)
    safe_d = jnp.where(jnp.abs(rays_d) < 1e-10, 1e-10, rays_d)
    d_intersect = (nominator / safe_d[:, None]).reshape(-1, 6)  # (P, 6)
    p_intersect = (
        d_intersect[..., None] * rays_d[:, None] + rays_o[:, None]
    )  # (P, 6, 3)
    min_xyz = bounds[0]
    max_xyz = bounds[1]
    p_mask = jnp.all(
        (p_intersect >= (min_xyz - eps)) & (p_intersect <= (max_xyz + eps)),
        axis=-1,
    )  # (P, 6)
    mask_at_box = p_mask.sum(axis=-1) == 2

    # Static-shape extraction of the two hit points per ray: sort hit flags
    # descending so the two valid intersections land in slots 0 and 1.
    order = jnp.argsort(~p_mask, axis=-1, stable=True)  # valid planes first
    first = jnp.take_along_axis(p_intersect, order[:, 0:1, None], axis=1)[:, 0]
    second = jnp.take_along_axis(p_intersect, order[:, 1:2, None], axis=1)[:, 0]

    norm_ray = jnp.linalg.norm(rays_d, axis=-1)
    sgn = jnp.where(
        jnp.sum((first - rays_o) * rays_d, axis=-1) < 0.0, -1.0, 1.0
    )
    d0 = jnp.linalg.norm(first - rays_o, axis=-1) / norm_ray * sgn
    d1 = jnp.linalg.norm(second - rays_o, axis=-1) / norm_ray * sgn
    near = jnp.minimum(d0, d1)
    far = jnp.maximum(d0, d1)
    return near, far, mask_at_box
