"""Shared neural-net layers: reflect-padded conv, InstanceNorm, masked
BatchNorm (sparse active-site statistics).

Counterparts of the torch layers the reference composes:
  * `nn.Conv2d(..., padding_mode='reflect', bias=False)`
    (/root/reference/libs/encoders/UNet.py:6-14,160-161),
  * `nn.InstanceNorm2d(track_running_stats=False, affine=True)`
    (UNet.py:115,151-162),
  * `nn.BatchNorm1d(eps=1e-3, momentum=0.01)` over sparse active sites
    (/root/reference/libs/nerfheads/networks/SparseConvNet.py:28-87).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


class ReflectConv(nn.Module):
    """Conv2d with reflect padding (NHWC). Matches torch's
    padding_mode='reflect' + stride semantics: pad first, then VALID conv."""

    features: int
    kernel_size: int = 3
    stride: int = 1
    use_bias: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        p = (self.kernel_size - 1) // 2
        if p > 0:
            x = jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")
        return nn.Conv(
            self.features,
            (self.kernel_size, self.kernel_size),
            strides=(self.stride, self.stride),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
        )(x)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=True, track_running_stats=False): normalize
    over spatial dims per (sample, channel); torch eps default 1e-5."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):  # (N, H, W, C)
        C = x.shape[-1]
        x = x.astype(jnp.float32)  # statistics always reduce in f32
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.epsilon)
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        return y * scale + bias


class MaskedBatchNorm(nn.Module):
    """BatchNorm over the valid rows of a padded (CAP, C) active-site matrix.

    Train mode: statistics over valid rows only (the reference computes them
    over all ~6890 rows incl. voxel duplicates; post-dedup stats differ
    negligibly — documented deviation). Running stats use torch's momentum
    convention: running = (1 - m) * running + m * batch, with unbiased
    variance in the running estimate (torch BatchNorm1d behavior).
    """

    momentum: float = 0.01
    epsilon: float = 1e-3

    @nn.compact
    def __call__(self, x, valid, *, use_running_average: bool):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        ra_mean = self.variable("batch_stats", "mean", lambda: jnp.zeros((C,)))
        ra_var = self.variable("batch_stats", "var", lambda: jnp.ones((C,)))

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            vf = valid.astype(x.dtype)[:, None]
            n = jnp.maximum(vf.sum(), 1.0)
            mean = (x * vf).sum(axis=0) / n
            var = (((x - mean) ** 2) * vf).sum(axis=0) / n
            if not self.is_initializing():
                unbiased = var * n / jnp.maximum(n - 1.0, 1.0)
                ra_mean.value = (
                    (1.0 - self.momentum) * ra_mean.value + self.momentum * mean
                )
                ra_var.value = (
                    (1.0 - self.momentum) * ra_var.value + self.momentum * unbiased
                )
        y = (x - mean) / jnp.sqrt(var + self.epsilon)
        return y * scale + bias


class MLP(nn.Module):
    """Linear stack with per-layer activations; kaiming-normal init matches
    the reference's `weights_init` (trainhead.py:13-17). `dtype` is the
    compute dtype (params stay float32; bfloat16 halves the MXU/HBM cost of
    the per-point heads on the inference path)."""

    features: Sequence[int]
    activations: Sequence[str]  # per layer: 'elu', 'relu', 'sigmoid', 'none'
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        for i, (f, act) in enumerate(zip(self.features, self.activations)):
            x = nn.Dense(
                f,
                kernel_init=nn.initializers.he_normal(),
                bias_init=nn.initializers.zeros,
                dtype=self.dtype,
                name=f"dense_{i}",
            )(x)
            if act == "elu":
                x = nn.elu(x)
            elif act == "relu":
                x = nn.relu(x)
            elif act == "sigmoid":
                x = nn.sigmoid(x)
        return x
