"""Bilinear upsampling with align_corners=True as separable matmuls.

The reference decoder upsamples with
`F.interpolate(x, scale_factor=2, mode='bilinear', align_corners=True)`
(/root/reference/libs/encoders/UNet.py:129). On TPU we express the separable
1D interpolations as two small static matmuls (MXU-friendly) instead of
gathers: out = A_h @ x @ A_w^T with A built once in numpy.
"""

from __future__ import annotations

from functools import lru_cache

import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=None)
def _interp_matrix(n_in: int, n_out: int) -> np.ndarray:
    """(n_out, n_in) align_corners=True linear interpolation matrix."""
    A = np.zeros((n_out, n_in), dtype=np.float32)
    if n_in == 1:
        A[:, 0] = 1.0
        return A
    src = np.arange(n_out, dtype=np.float64) * (n_in - 1) / (n_out - 1)
    lo = np.floor(src).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    w = (src - lo).astype(np.float32)
    A[np.arange(n_out), lo] += 1.0 - w
    A[np.arange(n_out), hi] += w
    return A


def upsample_bilinear_nhwc(x, scale: int = 2):
    """x: (N, H, W, C) -> (N, H*scale, W*scale, C), align_corners=True."""
    N, H, W, C = x.shape
    Ah = jnp.asarray(_interp_matrix(H, H * scale))
    Aw = jnp.asarray(_interp_matrix(W, W * scale))
    x = jnp.einsum("oh,nhwc->nowc", Ah, x)
    return jnp.einsum("pw,nowc->nopc", Aw, x)
