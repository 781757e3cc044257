"""SSIM oracle test: explicit sliding-window implementation (independent of
the production scipy.uniform_filter path)."""

import numpy as np

from gpnerf_tpu.ops.ssim import compare_ssim, ssim_single_channel


def slow_ssim(x, y, win=7, data_range=2.0, K1=0.01, K2=0.03):
    """Literal windowed SSIM with sample covariance; mean over windows whose
    center lies in the valid crop."""
    H, W = x.shape
    pad = (win - 1) // 2
    vals = []
    for i in range(pad, H - pad):
        for j in range(pad, W - pad):
            wx = x[i - pad : i + pad + 1, j - pad : j + pad + 1].ravel()
            wy = y[i - pad : i + pad + 1, j - pad : j + pad + 1].ravel()
            ux, uy = wx.mean(), wy.mean()
            vx = wx.var(ddof=1)
            vy = wy.var(ddof=1)
            vxy = ((wx - ux) * (wy - uy)).sum() / (win * win - 1)
            C1 = (K1 * data_range) ** 2
            C2 = (K2 * data_range) ** 2
            vals.append(
                ((2 * ux * uy + C1) * (2 * vxy + C2))
                / ((ux**2 + uy**2 + C1) * (vx + vy + C2))
            )
    return float(np.mean(vals))


def test_ssim_matches_windowed_oracle():
    rng = np.random.default_rng(0)
    x = rng.uniform(size=(20, 22))
    y = np.clip(x + 0.1 * rng.standard_normal((20, 22)), 0, 1)
    got = ssim_single_channel(x, y)
    want = slow_ssim(x, y)
    assert abs(got - want) < 1e-4, (got, want)


def test_ssim_identity_and_bounds():
    rng = np.random.default_rng(1)
    x = rng.uniform(size=(16, 16, 3))
    assert abs(compare_ssim(x, x, multichannel=True) - 1.0) < 1e-9
    y = rng.uniform(size=(16, 16, 3))
    s = compare_ssim(x, y, multichannel=True)
    assert -1.0 <= s < 1.0
