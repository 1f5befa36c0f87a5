"""Round-4 primitive probes: sublane gather at scale, wide lane gather,
sort throughput at target sizes, non-pow2 lengths.

Usage: python tools/ubench_r4_probe.py [names...]
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, f, *args, reps=5, elems=None):
    try:
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        import traceback
        tb = traceback.format_exc().strip().split("\n")
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:300]}")
        print("   last tb:", tb[-1][:200])
        return None, None
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    rate = f"({elems/best/1e9:.2f} Gelem/s)" if elems else ""
    print(f"{name:40s} compile={compile_s:6.2f}s  run={best*1e3:9.3f}ms {rate}")
    return out, best


rng = np.random.default_rng(0)
want = set(sys.argv[1:]) or {"sub", "wide", "sort", "scan"}

# ---------------------------------------------------------------- sublane
# out[r, l] = table[idx[r, l], l]; table (T,128) resident in VMEM.
if "sub" in want:
    for T, E in ((1024, 1 << 22), (4096, 1 << 22), (16384, 1 << 22)):
        R = E // 128
        BR = 256
        tbl = jnp.asarray(rng.random((T, 128), np.float32))
        idx = jnp.asarray(rng.integers(0, T, (R, 128)).astype(np.int32))

        def k(tbl_ref, idx_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(tbl_ref[:], idx_ref[:], axis=0)

        @jax.jit
        def g(tbl, idx, T=T, R=R, k=k):
            return pl.pallas_call(
                k,
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((T, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(tbl, idx)

        out, t = timeit(f"sublane gather T={T} E={E>>20}M", g, tbl, idx,
                        elems=E)
        if out is not None:
            ref = np.take_along_axis(
                np.asarray(tbl), np.asarray(idx)[:8], axis=0)
            print("   correct:", np.array_equal(np.asarray(out)[:8], ref))

# ---------------------------------------------------------------- wide lane
if "wide" in want:
    E = 1 << 22
    R = E // 128
    BR = 256
    for W in (128, 512, 1024):
        tbl = jnp.asarray(rng.random((8, W), np.float32))
        idx = jnp.asarray(rng.integers(0, W, (R, 128)).astype(np.int32))

        def k(tbl_ref, idx_ref, o_ref, W=W):
            t = jnp.broadcast_to(tbl_ref[0:1, :], (BR, W))
            o_ref[:] = jnp.take_along_axis(t, idx_ref[:], axis=1)

        @jax.jit
        def g(tbl, idx, W=W, k=k):
            return pl.pallas_call(
                k,
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((8, W), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(tbl, idx)

        out, t = timeit(f"lane gather W={W} E={E>>20}M", g, tbl, idx, elems=E)
        if out is not None:
            ref = np.asarray(tbl)[0][np.asarray(idx)[:8]]
            print("   correct:", np.array_equal(np.asarray(out)[:8], ref))

# ---------------------------------------------------------------- sorts
if "sort" in want:
    for L in (1 << 22, (1 << 22) + (13 << 15), 1 << 23):
        keys = jnp.asarray(rng.integers(0, L, L).astype(np.int32))
        vals = jnp.asarray(rng.random(L, np.float32))
        vals2 = jnp.asarray(rng.integers(0, 100, L).astype(np.int32))

        @jax.jit
        def s1(keys, vals):
            return jax.lax.sort((keys, vals), num_keys=1)

        timeit(f"sort L={L} (i32,f32)", s1, keys, vals, elems=L)

        @jax.jit
        def s3(keys, vals, vals2):
            return jax.lax.sort((keys, vals, vals2), num_keys=1)

        timeit(f"sort L={L} (i32,f32,i32)", s3, keys, vals, vals2, elems=L)

# ---------------------------------------------------------------- scan cost
if "scan" in want:
    # sublane-direction segmented scan per lane, sequential-grid carry
    L = 1 << 23
    R = L // 128
    BR = 512
    b = (rng.random((R, 128)) < 0.12).astype(np.int32)
    b[0] = 1
    bar = jnp.asarray(b)
    vals = jnp.asarray(rng.random((R, 128), np.float32))

    def k(b_ref, v_ref, o_ref, car_ref, bcar_ref):
        i = pl.program_id(0)
        bb = b_ref[:] != 0
        v = v_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 0)
        for s in [1 << j for j in range(BR.bit_length() - 1)]:
            bsh = pltpu.roll(bb.astype(jnp.int32), jnp.int32(s), 0) != 0
            okm = row >= s
            v = jnp.where(bb | ~okm, v, pltpu.roll(v, jnp.int32(s), 0) + v)
            bb = bb | (okm & bsh)

        @pl.when(i > 0)
        def _():
            nonlocal v
            pass

        carry = jnp.where(i > 0, car_ref[0, :], 0.0)
        v = jnp.where(bb, v, carry.reshape(1, 128) + v)
        o_ref[:] = v
        car_ref[0, :] = v[BR - 1, :]

    @jax.jit
    def scan(bar, vals):
        return pl.pallas_call(
            k,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((BR, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32),
                            pltpu.SMEM((1, 1), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(bar, vals)

    out, t = timeit(f"lanewise segscan L={L}", scan, bar, vals, elems=L)
    if out is not None:
        # host check of one lane
        bh = np.asarray(b)[:, 0]
        vh = np.asarray(vals)[:, 0]
        exp = np.zeros_like(vh)
        acc = 0.0
        for i in range(R):
            acc = vh[i] if bh[i] else acc + vh[i]
            exp[i] = acc
        got = np.asarray(out)[:, 0]
        print("   lane0 correct:", np.allclose(got, exp, rtol=1e-5))
