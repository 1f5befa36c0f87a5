"""Wide-table Pallas take_along_axis + XLA sort speeds."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

E = 1 << 21


def timeit(name, f, *args, reps=5):
    try:
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        print(f"{name:34s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None, None
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} compile={compile_s:7.2f}s  run={best*1e3:9.3f}ms "
          f"({E/best/1e9:.2f} Gidx/s)")
    return out, best


rng = np.random.default_rng(0)
want = set(sys.argv[1:]) or {"wide", "sublane", "sort"}

if "wide" in want:
    for W in (256, 1024, 4096):
        x = jnp.asarray(rng.random(W, np.float32))
        idx = jnp.asarray(rng.integers(0, W, E).astype(np.int32))
        SUB = 8  # sublane rows per tile

        def kw(x_ref, idx_ref, o_ref):
            # replicate table row across sublanes, gather within each row
            tbl = jnp.broadcast_to(x_ref[:].reshape(1, W), (SUB, W))
            o_ref[:] = jnp.take_along_axis(tbl, idx_ref[:], axis=1)

        R = E // 128
        TR = 64  # rows per program

        @jax.jit
        def gw(x, idx, W=W, kw=kw):
            i2 = idx.reshape(R, 128)
            return pl.pallas_call(
                kw,
                grid=(R // SUB,),
                in_specs=[
                    pl.BlockSpec((W,), lambda i: (0,), memory_space=pltpu.VMEM),
                    pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((SUB, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(x, i2).reshape(E)

        out, t = timeit(f"pallas wide-table W={W}", gw, x, idx)
        if out is not None:
            ref = np.asarray(x)[np.asarray(idx)]
            print("  correct:", np.array_equal(np.asarray(out), ref))

if "sublane" in want:
    # gather along sublanes: x2 (R0,128); idx (R,128); out[r,l] = x2[idx[r,l], l]
    R0 = 1024
    x2 = jnp.asarray(rng.random((R0, 128), np.float32))
    idxs = jnp.asarray(rng.integers(0, R0, (E // 128, 128)).astype(np.int32))

    def ks(x_ref, idx_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)

    @jax.jit
    def gs(x2, idxs):
        R = E // 128
        return pl.pallas_call(
            ks,
            grid=(R // 64,),
            in_specs=[
                pl.BlockSpec((R0, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((64, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((64, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(x2, idxs)

    out, t = timeit("pallas sublane gather R0=1024", gs, x2, idxs)
    if out is not None:
        ref = np.take_along_axis(np.asarray(x2), np.asarray(idxs), axis=0)
        print("  correct:", np.array_equal(np.asarray(out), ref))

if "sort" in want:
    keys = jnp.asarray(rng.integers(0, 1 << 30, E).astype(np.int32))
    vals = jnp.asarray(rng.random(E, np.float32))

    @jax.jit
    def s1(keys, vals):
        return jax.lax.sort((keys, vals), num_keys=1)

    timeit("xla sort 2M (i32 key + f32)", s1, keys, vals)

    @jax.jit
    def s2(keys):
        return jnp.sort(keys)

    timeit("xla sort 2M (i32 only)", s2, keys)
