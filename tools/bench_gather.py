"""Microbenchmark: gather strategies on TPU (grounds the kernel design for
the trilinear query / occupancy cull hot paths)."""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=5):
    out = jax.block_until_ready(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.time()
        out = jax.block_until_ready(fn(*args))
        ts.append(time.time() - t0)
    return min(ts), out


def main():
    rng = np.random.default_rng(0)
    TAB, C = 20480, 32
    Nq = 8 * 1024 * 1024  # 8M row gathers (the 8-corner x 1M-point pattern)
    feats32 = jnp.asarray(rng.standard_normal((TAB, C)).astype(np.float32))
    feats16 = feats32.astype(jnp.bfloat16)
    idx = jnp.asarray(rng.integers(0, TAB, Nq).astype(np.int32))

    t, _ = timeit(jax.jit(lambda f, i: f[i]), feats32, idx)
    print(f"row-gather f32 (8M x 32ch): {t * 1e3:8.2f} ms  ({Nq * C * 4 / t / 1e9:.1f} GB/s)")
    t, _ = timeit(jax.jit(lambda f, i: f[i]), feats16, idx)
    print(f"row-gather bf16:            {t * 1e3:8.2f} ms")

    # take_along_axis variant
    t, _ = timeit(
        jax.jit(lambda f, i: jnp.take(f, i, axis=0, unique_indices=False)),
        feats32, idx,
    )
    print(f"jnp.take f32:               {t * 1e3:8.2f} ms")

    # scalar gather from a dense volume (occupancy pattern)
    VOL = 48 * 192 * 192
    vol = jnp.asarray(rng.standard_normal(VOL).astype(np.float32))
    sidx = jnp.asarray(rng.integers(0, VOL, 4 * 1024 * 1024).astype(np.int32))
    t, _ = timeit(jax.jit(lambda v, i: v[i]), vol, sidx)
    print(f"scalar-gather 4M:           {t * 1e3:8.2f} ms")
    sidx8 = jnp.asarray(rng.integers(0, VOL, 32 * 1024 * 1024).astype(np.int32))
    t, _ = timeit(jax.jit(lambda v, i: v[i]), vol, sidx8)
    print(f"scalar-gather 32M:          {t * 1e3:8.2f} ms")

    # one-hot matmul gather (MXU): tile queries, bf16
    def onehot_gather(f, i):
        # (Nq,) -> tiles of 1024 queries
        T = 1024
        nt = i.shape[0] // T
        f16 = f.astype(jnp.bfloat16)

        def body(it):
            ids = jax.lax.dynamic_slice(i, (it * T,), (T,))
            oh = (ids[:, None] == jnp.arange(TAB)[None, :]).astype(jnp.bfloat16)
            return jnp.dot(oh, f16, preferred_element_type=jnp.float32)

        return jax.lax.map(body, jnp.arange(nt))

    small_idx = idx[: 1024 * 1024]
    t, _ = timeit(jax.jit(onehot_gather), feats32, small_idx)
    print(f"one-hot matmul 1M:          {t * 1e3:8.2f} ms")

    # pallas in-kernel gather from VMEM-resident table
    try:
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        TILE = 32768

        def kernel(f_ref, i_ref, o_ref):
            ids = i_ref[:]
            o_ref[:] = f_ref[ids]

        def pallas_gather(f, i):
            return pl.pallas_call(
                kernel,
                grid=(i.shape[0] // TILE,),
                in_specs=[
                    pl.BlockSpec((TAB, C), lambda k: (0, 0), memory_space=pltpu.VMEM),
                    pl.BlockSpec((TILE,), lambda k: (k,), memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((TILE, C), lambda k: (k, 0), memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((i.shape[0], C), f.dtype),
            )(f, i)

        t, out = timeit(jax.jit(pallas_gather), feats32, idx)
        ref = np.asarray(feats32)[np.asarray(idx[:100])]
        np.testing.assert_allclose(np.asarray(out[:100]), ref)
        print(f"pallas vmem-gather 8M:      {t * 1e3:8.2f} ms")
    except Exception as e:
        print(f"pallas gather failed: {type(e).__name__}: {str(e)[:300]}")


if __name__ == "__main__":
    main()
