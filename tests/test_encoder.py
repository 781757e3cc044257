"""ResUNet encoder parity vs an exact torch replica of the reference
architecture (/root/reference/libs/encoders/UNet.py:133-234), with weights
copied from the flax model. Validates reflect-pad convs, InstanceNorm,
align-corners bilinear upsampling, skip concats, and the full topology."""

import flax
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

from gpnerf_tpu.models.encoder import ResUNet


# ---- torch replica of the reference encoder (independent reimplementation
# of the same published architecture, for oracle use only) ------------------
def _conv3(i, o, s=1):
    return nn.Conv2d(i, o, 3, s, 1, bias=False, padding_mode="reflect")


def _in(c):
    return nn.InstanceNorm2d(c, affine=True, track_running_stats=False)


class TBasic(nn.Module):
    def __init__(self, i, o, s=1, down=False):
        super().__init__()
        self.conv1 = _conv3(i, o, s)
        self.bn1 = _in(o)
        self.conv2 = _conv3(o, o)
        self.bn2 = _in(o)
        self.down = (
            nn.Sequential(nn.Conv2d(i, o, 1, s, bias=False), _in(o)) if down else None
        )

    def forward(self, x):
        idn = self.down(x) if self.down is not None else x
        out = F.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return F.relu(out + idn)


class TConvINElu(nn.Module):
    def __init__(self, i, o, k):
        super().__init__()
        self.conv = nn.Conv2d(i, o, k, 1, (k - 1) // 2, padding_mode="reflect")
        self.bn = _in(o)

    def forward(self, x):
        return F.elu(self.bn(self.conv(x)))


class TResUNet(nn.Module):
    def __init__(self, out_ch=32):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False, padding_mode="reflect")
        self.bn1 = _in(64)

        def stage(i, o, n):
            blocks = [TBasic(i, o, 2, down=True)]
            blocks += [TBasic(o, o) for _ in range(n - 1)]
            return nn.Sequential(*blocks)

        self.layer1 = stage(64, 64, 3)
        self.layer2 = stage(64, 128, 4)
        self.layer3 = stage(128, 256, 6)
        self.upconv3 = TConvINElu(256, 128, 3)
        self.iconv3 = TConvINElu(128 + 128, 128, 3)
        self.upconv2 = TConvINElu(128, 64, 3)
        self.iconv2 = TConvINElu(64 + 64, out_ch, 3)
        self.out_conv = nn.Conv2d(out_ch, out_ch, 1, 1)

    def forward(self, x):
        x = F.relu(self.bn1(self.conv1(x)))
        x1 = self.layer1(x)
        x2 = self.layer2(x1)
        x3 = self.layer3(x2)
        y = F.interpolate(x3, scale_factor=2, mode="bilinear", align_corners=True)
        y = self.upconv3(y)
        y = self.iconv3(torch.cat([y, x2], 1))  # [upsampled, skip] (UNet.py:205-215)
        y = F.interpolate(y, scale_factor=2, mode="bilinear", align_corners=True)
        y = self.upconv2(y)
        y = self.iconv2(torch.cat([y, x1], 1))
        return self.out_conv(y)


def _copy_conv(tconv, fparams):
    """flax kernel (kh, kw, ci, co) -> torch (co, ci, kh, kw)."""
    k = np.asarray(fparams["kernel"]).transpose(3, 2, 0, 1)
    tconv.weight.data = torch.from_numpy(np.ascontiguousarray(k))
    if "bias" in fparams:
        tconv.bias.data = torch.from_numpy(np.asarray(fparams["bias"]))


def _copy_in(tin, fparams):
    tin.weight.data = torch.from_numpy(np.asarray(fparams["scale"]))
    tin.bias.data = torch.from_numpy(np.asarray(fparams["bias"]))


def _copy_basic(tb, fp):
    _copy_conv(tb.conv1, fp["conv1"]["Conv_0"])
    _copy_in(tb.bn1, fp["bn1"])
    _copy_conv(tb.conv2, fp["conv2"]["Conv_0"])
    _copy_in(tb.bn2, fp["bn2"])
    if tb.down is not None:
        _copy_conv(tb.down[0], fp["ds_conv"]["Conv_0"])
        _copy_in(tb.down[1], fp["ds_norm"])


def _copy_cie(tc, fp):
    _copy_conv(tc.conv, fp["conv"]["Conv_0"])
    _copy_in(tc.bn, fp["bn"])


@pytest.mark.slow
def test_resunet_matches_torch_replica():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 64, 64, 3)).astype(np.float32)

    enc = ResUNet(out_ch=32)
    variables = enc.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(enc.apply(variables, jnp.asarray(x)))

    fp = flax.core.unfreeze(variables["params"])
    t = TResUNet(32).eval()
    _copy_conv(t.conv1, fp["conv1"])
    _copy_in(t.bn1, fp["bn1"])
    for li, (lname, n) in enumerate(
        [("layer1", 3), ("layer2", 4), ("layer3", 6)], start=1
    ):
        for b in range(n):
            _copy_basic(getattr(t, lname)[b], fp[f"{lname}_{b}"])
    _copy_cie(t.upconv3, fp["upconv3"])
    _copy_cie(t.iconv3, fp["iconv3"])
    _copy_cie(t.upconv2, fp["upconv2"])
    _copy_cie(t.iconv2, fp["iconv2"])
    _copy_conv(t.out_conv, fp["out_conv"])

    with torch.no_grad():
        ref = t(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    out_nchw = out.transpose(0, 3, 1, 2)
    assert out_nchw.shape == ref.shape == (2, 32, 16, 16)
    np.testing.assert_allclose(out_nchw, ref, rtol=1e-3, atol=1e-4)
