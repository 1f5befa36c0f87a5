"""Test which gather forms Mosaic/Pallas supports on this TPU, and how fast.

Variants:
  take128  - per-tile 128-entry table, idx in [0,128)
  takebig  - full x (N,) resident in VMEM, arbitrary idx
  take2d   - take_along_axis within (8,128) rows
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 17
E = 1 << 21  # 2M gathers
TILE = 1024  # idx per program, shaped (8,128)


def timeit(name, f, *args, reps=5):
    try:
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None, None
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} compile={compile_s:7.2f}s  run={best*1e3:9.3f}ms "
          f"({E/best/1e9:.2f} Gidx/s)")
    return out, best


rng = np.random.default_rng(0)
x = jnp.asarray(rng.random(N, np.float32))
idx = jnp.asarray(rng.integers(0, N, E).astype(np.int32))
idx128 = jnp.asarray(rng.integers(0, 128, E).astype(np.int32))
want = set(sys.argv[1:]) or {"take128", "takebig", "take2d"}

if "take128" in want:
    x128 = x[:128]

    def k128(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def g128(x128, idx):
        i2 = idx.reshape(E // TILE, TILE // 128, 128)
        return pl.pallas_call(
            k128,
            grid=(E // TILE,),
            in_specs=[
                pl.BlockSpec((128,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE // 128, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE // 128, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E // TILE, TILE // 128, 128),
                                           jnp.float32),
        )(x128, i2).reshape(E)

    out, t = timeit("pallas take128", g128, x128, idx128)
    if out is not None:
        ref = np.asarray(x128)[np.asarray(idx128)]
        print("  correct:", np.array_equal(np.asarray(out), ref))

if "takebig" in want:
    def kbig(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take(x_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def gbig(x, idx):
        i2 = idx.reshape(E // TILE, TILE // 128, 128)
        return pl.pallas_call(
            kbig,
            grid=(E // TILE,),
            in_specs=[
                pl.BlockSpec((N,), lambda i: (0,), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE // 128, 128), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, TILE // 128, 128), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((E // TILE, TILE // 128, 128),
                                           jnp.float32),
        )(x, i2).reshape(E)

    out, t = timeit("pallas takebig (N in VMEM)", gbig, x, idx)
    if out is not None:
        ref = np.asarray(x)[np.asarray(idx)]
        print("  correct:", np.array_equal(np.asarray(out), ref))

if "take2d" in want:
    x2 = jnp.asarray(rng.random((E // 128, 128), np.float32))
    idxr = jnp.asarray(rng.integers(0, 128, (E // 128, 128)).astype(np.int32))

    def k2d(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=1)

    @jax.jit
    def g2d(x2, idxr):
        R = E // 128
        return pl.pallas_call(
            k2d,
            grid=(R // 64,),
            in_specs=[
                pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(x2, idxr)

    out, t = timeit("pallas take_along rows", g2d, x2, idxr)
    if out is not None:
        ref = np.take_along_axis(np.asarray(x2), np.asarray(idxr), axis=1)
        print("  correct:", np.array_equal(np.asarray(out), ref))
