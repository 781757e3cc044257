"""ResNet34-UNet image encoder (flax/linen, NHWC).

Architectural twin of the reference's `ResUNet`
(/root/reference/libs/encoders/UNet.py:133-234): ResNet34-style encoder
(layers [3, 4, 6, 3], first 7x7 stride-2 conv, three stride-2 stages) with
InstanceNorm2d(affine, no running stats) and reflect padding everywhere;
U-Net decoder upconv3/iconv3/upconv2/iconv2 with skip concats, bilinear
align_corners=True upsampling, final 1x1 conv to `out_ch` at 1/4 input
resolution (512x512 input -> 128x128x32 featmap). Trained from scratch (the
reference loads no pretrained weights). resnet50+ variants (Bottleneck) are
defined but unreachable in the reference (UNet.py:154) and are not ported.

Skip-connection padding (UNet.py:205-215) is a no-op for the 32-multiple
input sizes used everywhere; sizes here are static so the concat asserts
equality instead.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from gpnerf_tpu.models.layers import InstanceNorm, ReflectConv
from gpnerf_tpu.ops.upsample import upsample_bilinear_nhwc


class BasicBlock(nn.Module):
    """UNet.py:17-54 with InstanceNorm. `dtype` is the conv compute dtype
    (InstanceNorm statistics always reduce in float32)."""

    planes: int
    stride: int = 1
    has_downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        identity = x
        out = ReflectConv(self.planes, 3, self.stride, dtype=self.dtype, name="conv1")(x)
        out = InstanceNorm(name="bn1")(out)
        out = nn.relu(out)
        out = ReflectConv(self.planes, 3, 1, dtype=self.dtype, name="conv2")(out)
        out = InstanceNorm(name="bn2")(out)
        if self.has_downsample:
            identity = ReflectConv(
                self.planes, 1, self.stride, dtype=self.dtype, name="ds_conv"
            )(x)
            identity = InstanceNorm(name="ds_norm")(identity)
        return nn.relu(out + identity)


class ConvINElu(nn.Module):
    """Decoder conv block: reflect conv (with bias) + InstanceNorm + ELU
    (UNet.py:106-121)."""

    features: int
    kernel_size: int = 3
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        x = ReflectConv(
            self.features, self.kernel_size, 1, use_bias=True, dtype=self.dtype,
            name="conv",
        )(x)
        x = InstanceNorm(name="bn")(x)
        return nn.elu(x)


class ResUNet(nn.Module):
    """Input (V, H, W, 3) normalized images; output (V, H/4, W/4, out_ch).

    compute_dtype=bfloat16 runs all convolutions on the MXU in bf16 (params
    float32; InstanceNorm statistics float32) — the reference trains from
    scratch with no pretrained weights, so inference-time bf16 convs are a
    pure speed/precision trade gated by cfg.tpu.matmul_dtype."""

    out_ch: int = 32
    encoder: str = "resnet34"
    compute_dtype: object = None

    @nn.compact
    def __call__(self, x):
        assert self.encoder in ("resnet18", "resnet34", "tiny"), (
            "only BasicBlock encoders are reachable in the reference "
            "(UNet.py:154 hard-codes BasicBlock); 'tiny' ([1,1,1] blocks) "
            "is a test-only variant that cuts orchestration-test compile "
            "time — never used by production configs"
        )
        layers = {
            "resnet34": [3, 4, 6, 3],
            "resnet18": [2, 2, 2, 2],
            "tiny": [1, 1, 1, 1],
        }[self.encoder]
        dt = self.compute_dtype

        # stem: 7x7 s2 reflect conv, IN, relu (UNet.py:160-162)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)), mode="reflect")
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID", use_bias=False,
                    dtype=dt, name="conv1")(x)
        x = nn.relu(InstanceNorm(name="bn1")(x))

        def stage(x, planes, blocks, name):
            # stride-2 stage start always carries a 1x1 downsample projection
            # (UNet.py:183-189: created when stride != 1)
            x = BasicBlock(
                planes, stride=2, has_downsample=True, dtype=dt, name=f"{name}_0"
            )(x)
            for b in range(1, blocks):
                x = BasicBlock(planes, dtype=dt, name=f"{name}_{b}")(x)
            return x

        x1 = stage(x, 64, layers[0], "layer1")  # H/4, 64
        x2 = stage(x1, 128, layers[1], "layer2")  # H/8, 128
        x3 = stage(x2, 256, layers[2], "layer3")  # H/16, 256

        # decoder (UNet.py:170-177, 217-234). Concat order is
        # [upsampled, skip]: skipconnect(x1, x2) returns cat([x2, x1]) and is
        # called as skipconnect(skip, upsampled) (UNet.py:205-215, 225-230) —
        # the channel counts coincide (128+128 / 64+64) so only checkpoint
        # cross-validation against the real reference module catches a swap.
        y = upsample_bilinear_nhwc(x3, 2)
        y = ConvINElu(128, dtype=dt, name="upconv3")(y)
        assert y.shape[1:3] == x2.shape[1:3]
        y = ConvINElu(128, dtype=dt, name="iconv3")(jnp.concatenate([y, x2], axis=-1))

        y = upsample_bilinear_nhwc(y, 2)
        y = ConvINElu(64, dtype=dt, name="upconv2")(y)
        assert y.shape[1:3] == x1.shape[1:3]
        y = ConvINElu(self.out_ch, dtype=dt, name="iconv2")(
            jnp.concatenate([y, x1], axis=-1)
        )

        return nn.Conv(self.out_ch, (1, 1), use_bias=True, dtype=dt, name="out_conv")(y)


def build_encoder(cfg):
    """Factory mirroring UNet.py:237-243."""
    return ResUNet(out_ch=cfg.encoder.out_ch, encoder=cfg.encoder.name)


from gpnerf_tpu.registry import register  # noqa: E402

register("encoder", "UNet", build_encoder)
