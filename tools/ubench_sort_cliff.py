"""Find the XLA fast-sort size cliff; prototype MXU cumsum + fill kernels."""

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
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return None, None
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    n = args[0].shape[0]
    print(f"{name:40s} compile={compile_s:7.2f}s  run={best*1e3:9.3f}ms"
          f"  ({n/best/1e9:.2f} Gelem/s)")
    return out, best


rng = np.random.default_rng(0)
want = set(sys.argv[1:]) or {"cliff", "cumsum", "fill"}

if "cliff" in want:
    for E in (1 << 22, 1 << 23):
        keys = jnp.asarray(rng.permutation(E).astype(np.int32))
        vals = jnp.asarray(rng.random(E, np.float32))
        f = jax.jit(lambda k, v: jax.lax.sort((k, v), num_keys=1))
        timeit(f"sort {E>>20}M perm-key (k,v)", f, keys, vals)

if "cumsum" in want:
    E = 1 << 21
    x = jnp.asarray(rng.random(E, np.float32))
    BR, BC = 256, 128  # 32768 elements per program

    U_BC = jnp.triu(jnp.ones((BC, BC), jnp.float32))       # i<=j
    U_BR = jnp.triu(jnp.ones((BR, BR), jnp.float32), k=1)  # i<j (strict)

    def k_cumsum(x_ref, o_ref, carry):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            carry[0, 0] = 0.0

        blk = x_ref[:]  # (BR, BC)
        within = jax.lax.dot_general(
            blk, U_BC, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # row-wise cumsum
        rowsum = within[:, BC - 1:BC]                      # (BR,1)
        rowpref = jax.lax.dot_general(
            U_BR, rowsum, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)            # (BR,1) excl
        o_ref[:] = within + rowpref + carry[0, 0]
        carry[0, 0] += rowsum[BR - 1, 0] + rowpref[BR - 1, 0]

    @jax.jit
    def pscan(x):
        R = E // BC
        x2 = x.reshape(R, BC)
        out = pl.pallas_call(
            k_cumsum,
            grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, BC), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32)],
        )(x2)
        return out.reshape(E)

    out, t = timeit("pallas MXU cumsum 2M", pscan, x)
    if out is not None:
        ref = np.cumsum(np.asarray(x, np.float64))
        err = np.max(np.abs(np.asarray(out, np.float64) - ref) / (np.abs(ref) + 1))
        print(f"  max rel err vs f64 oracle: {err:.2e}")

if "fill" in want:
    # forward-fill: out[i] = val at latest barrier slot <= i
    E = 1 << 21
    n_bar = 1 << 17
    pos = np.sort(rng.choice(E, n_bar, replace=False))
    pos[0] = 0
    barrier = np.zeros(E, np.int32)
    barrier[pos] = 1
    vals = rng.random(E, np.float32).astype(np.float32)
    barj = jnp.asarray(barrier)
    valj = jnp.asarray(vals)

    BR, BC = 256, 128
    SHIFTS_C = [1 << s for s in range(7)]    # within 128 lanes
    SHIFTS_R = [1 << s for s in range(8)]    # across 256 sublanes

    def k_fill(v_ref, b_ref, o_ref, vcar, bcar):
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            vcar[0, 0] = 0.0
            bcar[0, 0] = 0

        v = v_ref[:]
        b = b_ref[:] != 0
        # hillis-steele within rows (lane axis): shift right by s
        for s in SHIFTS_C:
            vs = pltpu.roll(v, s, 1)
            bs = pltpu.roll(b.astype(jnp.int32), s, 1) != 0
            lane = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 1)
            okm = lane >= s
            v = jnp.where(b, v, jnp.where(okm & bs, vs, v))
            b = b | (okm & bs)
        # now each row's fill is complete given row-local barriers; do rows
        for s in SHIFTS_R:
            vs = pltpu.roll(v, s, 0)
            bs = pltpu.roll(b.astype(jnp.int32), s, 0) != 0
            row = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 0)
            okm = row >= s
            # a row without its own barrier takes the last lane of row-s
            last_v = jnp.broadcast_to(vs[:, BC - 1:BC], (BR, BC))
            last_b = jnp.broadcast_to(bs[:, BC - 1:BC] if bs.dtype == jnp.bool_
                                      else (pltpu.roll(b, s, 0) != 0)[:, BC - 1:BC],
                                      (BR, BC))
            v = jnp.where(b, v, jnp.where(okm & last_b, last_v, v))
            b = b | (okm & last_b)
        # carry from previous blocks
        v = jnp.where(b, v, vcar[0, 0])
        o_ref[:] = v
        vcar[0, 0] = v[BR - 1, BC - 1]
        bcar[0, 0] = 1

    @jax.jit
    def pfill(v, bar):
        R = E // BC
        return pl.pallas_call(
            k_fill,
            grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, BC), jnp.float32),
            scratch_shapes=[pltpu.SMEM((1, 1), jnp.float32),
                            pltpu.SMEM((1, 1), jnp.int32)],
        )(v.reshape(R, BC), bar.reshape(R, BC)).reshape(E)

    out, t = timeit("pallas fill 2M", pfill, valj, barj)
    if out is not None:
        # numpy oracle
        idx = np.maximum.accumulate(np.where(barrier == 1, np.arange(E), -1))
        ref = vals[np.maximum(idx, 0)]
        ok = np.array_equal(np.asarray(out), ref)
        print(f"  correct: {ok}")
