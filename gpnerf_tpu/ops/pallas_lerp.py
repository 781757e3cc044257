"""Pallas TPU kernel: fused 4-tap bilinear weighted sum + int8 dequant of
the merged projection gather rows, emitted channel-major.

The demo renderer's largest per-point HBM consumer after the gathers is a
pure LAYOUT cost: XLA re-tiles the (P, V, 4C) int8 gather output twice
(T(8,128) -> T(4,128) reshape + a transpose copy, measured 2.4 ms/frame at
319k points x 3 views) because every downstream point-stage op runs
point-on-lanes, while a gather necessarily writes row-major rows. This
kernel consumes the rows in their NATIVE row-major layout, does the
weighted corner sum + dequantization on-chip, and writes the float result
(C, P*V) channel-major — point-on-lanes, the orientation the point stages
want — so neither side pays a relayout copy.

Matches `ops.grid_sample.bilinear_quad_nhwc_pv` semantics (weights fold the
in-bounds masks; `scale` is the per-channel int8 dequant factor applied
after the sum — interpolation is linear so the factor commutes out).
Accumulation is float32 (the XLA path accumulates in the compute dtype;
f32 here is free on the VPU and strictly tighter).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lerp_kernel(rows_ref, w_ref, scale_ref, out_ref, *, C: int):
    # rows: (B, 4C) int8/float; w: (4, B) f32; scale: (C, 1) f32;
    # out: (C, B) out_dtype.
    #
    # The corner extraction runs as 4 tiny MXU contractions against
    # constant one-hot selectors S_k (C, 4C): lane slices at k*C offsets
    # (C = 35, never 128-aligned) cost Mosaic lane rotations per tap, and
    # the (B, C) -> (C, B) transpose costs a VMEM relayout — the
    # dot_general produces the channel-major block directly and the
    # selectors fold both away at ~0.2 ms of MXU time per frame.
    tmp = rows_ref[:].astype(jnp.bfloat16)  # (B, 4C)
    row = jax.lax.broadcasted_iota(jnp.int32, (C, 4 * C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, 4 * C), 1)
    acc = 0.0
    for k in range(4):
        sel = (col == k * C + row).astype(jnp.bfloat16)  # (C, 4C) one-hot
        d = jax.lax.dot_general(
            sel, tmp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, B)
        acc = acc + d * w_ref[k, :][None, :]
    out_ref[:] = (acc * scale_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block", "interpret")
)
def quad_lerp_rows_cm(rows, w4, scale, *, out_dtype=jnp.bfloat16,
                      block=2048, interpret=False):
    """rows (N, 4C) + per-row tap weights w4 (4, N) + per-channel scale (C,)
    -> (C, N) weighted sums, channel-major. N is padded to `block`
    internally (zero weights on the pad)."""
    N, C4 = rows.shape
    C = C4 // 4
    pad = (-N) % block
    if pad:
        rows = jnp.pad(rows, ((0, pad), (0, 0)))
        w4 = jnp.pad(w4, ((0, 0), (0, pad)))
    Np = N + pad
    out = pl.pallas_call(
        functools.partial(_lerp_kernel, C=C),
        grid=(Np // block,),
        in_specs=[
            pl.BlockSpec((block, C4), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, block), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((C, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C, Np), out_dtype),
        interpret=interpret,
    )(rows, w4, scale.reshape(C, 1).astype(jnp.float32))
    return out[:, :N]


def _lerp_kernel_vcp(rows_ref, w_ref, scale_ref, out_ref, *, C: int):
    # rows: (B, 4C); w: (1, 4, B) f32; scale: (C, 1) f32; out: (1, C, B)
    tmp = rows_ref[:].astype(jnp.bfloat16)  # (B, 4C)
    row = jax.lax.broadcasted_iota(jnp.int32, (C, 4 * C), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (C, 4 * C), 1)
    acc = 0.0
    for k in range(4):
        sel = (col == k * C + row).astype(jnp.bfloat16)  # (C, 4C) one-hot
        d = jax.lax.dot_general(
            sel, tmp, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, B)
        acc = acc + d * w_ref[0, k, :][None, :]
    out_ref[0] = (acc * scale_ref[:]).astype(out_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("out_dtype", "block", "interpret")
)
def quad_lerp_rows_vcp(rows_vmajor, w4, scale, *, out_dtype=jnp.bfloat16,
                       block=2048, interpret=False):
    """View-major form: rows (V*P, 4C) flattened v-outer, weights (V, 4, P)
    -> (V, C, P) weighted sums. (V, C, P) is PHYSICALLY the layout the
    point stages assign to rgb_feat (P on lanes, views outermost), so the
    caller's transpose back to logical (P, V, C) folds away. P is padded to
    `block` per view internally (zero weights on the pad)."""
    V, _, P = w4.shape
    C4 = rows_vmajor.shape[-1]
    C = C4 // 4
    pad = (-P) % block
    if pad:
        rows_vmajor = jnp.pad(
            rows_vmajor.reshape(V, P, C4), ((0, 0), (0, pad), (0, 0))
        ).reshape(V * (P + pad), C4)
        w4 = jnp.pad(w4, ((0, 0), (0, 0), (0, pad)))
    Pp = P + pad
    nb = Pp // block
    out = pl.pallas_call(
        functools.partial(_lerp_kernel_vcp, C=C),
        grid=(V, nb),
        in_specs=[
            pl.BlockSpec((block, C4), lambda v, i: (v * nb + i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, block), lambda v, i: (v, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda v, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, block), lambda v, i: (v, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((V, C, Pp), out_dtype),
        interpret=interpret,
    )(rows_vmajor, w4, scale.reshape(C, 1).astype(jnp.float32))
    return out[:, :, :P]
