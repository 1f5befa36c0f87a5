"""Probe the lanepipe building blocks on TPU.

1. transgather: emulate sublane gather t[r,l] = tbl[idx[r,l], l] on a
   (128,128) window via transpose -> take_along_axis(axis=1) -> transpose.
2. window: per-block window DMA via scalar-prefetch index_map.
3. fill+mult fused kernel shape: window rows, local idx, multiply.
4. lanescan: sublane-direction segmented scan (per-lane independent).
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
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:300]}")
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
want = set(sys.argv[1:]) or {"transgather", "window", "lanescan"}

# --------------------------------------------------- transpose-gather
if "transgather" in want:
    E = 1 << 22
    R = E // 128
    BR = 256  # sublanes per program; processed as 2 (128,128) tiles
    tbl = jnp.asarray(rng.random((128, 128), np.float32))
    idx = jnp.asarray(rng.integers(0, 128, (R, 128)).astype(np.int32))

    def k(tbl_ref, idx_ref, o_ref):
        tt = tbl_ref[:].T  # (128,128): tt[l, h] = tbl[h, l]
        for s in range(BR // 128):
            ix = idx_ref[s * 128:(s + 1) * 128, :]      # (128,128)
            g = jnp.take_along_axis(tt, ix.T, axis=1)   # g[l,k]=tt[l,ix[k,l]]
            o_ref[s * 128:(s + 1) * 128, :] = g.T

    @jax.jit
    def g(tbl, idx):
        return pl.pallas_call(
            k,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((128, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((BR, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(tbl, idx)

    out, t = timeit(f"transgather E={E>>20}M", g, tbl, idx, elems=E)
    if out is not None:
        th, ih = np.asarray(tbl), np.asarray(idx)
        ref = np.take_along_axis(th, ih[:128], axis=0)
        print("   correct:", np.array_equal(np.asarray(out)[:128], ref))

# --------------------------------------------------- window via prefetch
if "window" in want:
    E = 1 << 22
    R = E // 128
    BR = 256
    NW = 64  # table is (NW*128, 128); each block reads a 128-row window
    tbl = jnp.asarray(rng.random((NW * 128, 128), np.float32))
    base = rng.integers(0, NW, R // BR).astype(np.int32)  # window row-block
    idx = jnp.asarray(rng.integers(0, 128, (R, 128)).astype(np.int32))
    basej = jnp.asarray(base)

    def k(base_ref, tblw_ref, idx_ref, o_ref):
        tt = tblw_ref[:].T
        for s in range(BR // 128):
            ix = idx_ref[s * 128:(s + 1) * 128, :]
            g = jnp.take_along_axis(tt, ix.T, axis=1)
            o_ref[s * 128:(s + 1) * 128, :] = g.T

    @jax.jit
    def g(base, tbl, idx):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(R // BR,),
            in_specs=[
                pl.BlockSpec((128, 128), lambda i, b: (b[i], 0)),
                pl.BlockSpec((BR, 128), lambda i, b: (i, 0)),
            ],
            out_specs=pl.BlockSpec((BR, 128), lambda i, b: (i, 0)),
        )
        return pl.pallas_call(
            k,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(base, tbl, idx)

    out, t = timeit(f"window-transgather E={E>>20}M", g, basej, tbl, idx,
                    elems=E)
    if out is not None:
        th, ih = np.asarray(tbl), np.asarray(idx)
        b0 = base[0]
        ref = np.take_along_axis(th[b0 * 128:(b0 + 1) * 128], ih[:128], axis=0)
        print("   correct:", np.array_equal(np.asarray(out)[:128], ref))

# --------------------------------------------------- lanewise segscan v2
if "lanescan" in want:
    L = 1 << 23
    R = L // 128
    BR = 512
    b = (rng.random((R, 128)) < 0.12).astype(np.int32)
    b[0] = 1
    bar = jnp.asarray(b)
    vals = jnp.asarray(rng.random((R, 128), np.float32))

    def k(b_ref, v_ref, o_ref, car_ref):
        i = pl.program_id(0)
        bb = b_ref[:] != 0
        v = v_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (BR, 128), 0)
        carry = jnp.where(i > 0, car_ref[0, :], jnp.float32(0))
        v = jnp.where(bb | (row != 0), v, carry.reshape(1, 128) + v)
        bb = bb | (row == 0) & (i == 0)
        for s in [1 << j for j in range(BR.bit_length() - 1)]:
            bsh = pltpu.roll(bb.astype(jnp.int32), jnp.int32(s), 0) != 0
            okm = row >= s
            v = jnp.where(bb | ~okm, v, pltpu.roll(v, jnp.int32(s), 0) + v)
            bb = bb | (okm & bsh)
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
            scratch_shapes=[pltpu.VMEM((1, 128), jnp.float32)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
        )(bar, vals)

    out, t = timeit(f"lanescan L={L>>20}M", scan, bar, vals, elems=L)
    if out is not None:
        bh = np.asarray(b)[:, 7]
        vh = np.asarray(vals)[:, 7]
        exp = np.zeros_like(vh)
        acc = 0.0
        for i in range(R):
            acc = vh[i] if bh[i] else acc + vh[i]
            exp[i] = acc
        got = np.asarray(out)[:, 7]
        print("   lane7 correct:", np.allclose(got, exp, rtol=1e-4))
