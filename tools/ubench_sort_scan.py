"""Verify XLA sort speed/correctness at scale; prototype Pallas scan kernel."""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, f, *args, reps=5):
    try:
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        import traceback
        traceback.print_exc()
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:160]}")
        return None, None
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    n = args[0].shape[0] if hasattr(args[0], "shape") else 0
    print(f"{name:40s} compile={compile_s:7.2f}s  run={best*1e3:9.3f}ms"
          f"  ({n/best/1e9:.2f} Gelem/s)")
    return out, best


rng = np.random.default_rng(0)
want = set(sys.argv[1:]) or {"sort", "scan"}

if "sort" in want:
    for E in (1 << 21, 1 << 24):
        keys = jnp.asarray(rng.integers(0, 1 << 30, E).astype(np.int32))
        vals = jnp.asarray(rng.random(E, np.float32))
        v2 = jnp.asarray(rng.integers(0, 100, E).astype(np.int32))

        f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        out, t = timeit(f"sort {E>>20}M (k,v)", f, keys, vals)
        if out is not None:
            ks = np.asarray(out[0])
            ok = bool(np.all(np.diff(ks) >= 0))
            # payload integrity: sum preserved and matches np argsort
            vs = np.asarray(out[1])
            order = np.argsort(np.asarray(keys), kind="stable")
            match = np.array_equal(np.asarray(vals)[order], vs)
            print(f"  sorted={ok} payload_exact={match}")

        f3 = jax.jit(lambda k, v, w: jax.lax.sort((k, v, w), num_keys=1))
        timeit(f"sort {E>>20}M (k,v1,v2)", f3, keys, vals, v2)

        f2k = jax.jit(lambda k, v, w: jax.lax.sort((k, v, w), num_keys=2))
        timeit(f"sort {E>>20}M 2-key", f2k, keys, v2, vals)

if "scan" in want:
    E = 1 << 21
    x = jnp.asarray(rng.random(E, np.float32))

    # Pallas one-pass blocked cumsum: sequential grid, carry in scratch.
    BR, BC = 64, 128  # 8192 elements per program

    def scan_kernel(x_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0, 0] = 0.0

        blk = x_ref[:]
        # cumsum along a (BR, BC) block in row-major order:
        rowsum = jnp.sum(blk, axis=1, keepdims=True)          # (BR,1)
        rowpref = jnp.cumsum(rowsum, axis=0) - rowsum          # excl row prefix
        within = jnp.cumsum(blk, axis=1)                        # (BR,BC)
        o_ref[:] = within + rowpref + carry[0, 0]
        carry[0, 0] = carry[0, 0] + jnp.sum(rowsum)

    @jax.jit
    def pscan(x):
        R = E // BC
        x2 = x.reshape(R, BC)
        out = pl.pallas_call(
            scan_kernel,
            grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, BC), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        )(x2)
        return out.reshape(E)

    out, t = timeit("pallas cumsum 2M", pscan, x)
    if out is not None:
        ref = np.cumsum(np.asarray(x), dtype=np.float64)
        err = np.max(np.abs(np.asarray(out, np.float64) - ref) / (np.abs(ref) + 1))
        print(f"  max rel err vs f64: {err:.2e}")

    timeit("xla cumsum 2M", jax.jit(jnp.cumsum), x)
