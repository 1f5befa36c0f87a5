"""Probe TPU primitives for replacing lanepipe's global lax.sorts.

The route/extract steps of the lanepipe (core/engine/lanepipe.py:622,640,658)
are STATIC permutations currently executed as lax.sort (~42 ms at 9.4M
elements, measured round 4).  This probe measures the candidate
replacements on the real chip, using the tunnel-honest protocol: the op
iterated inside a jitted fori_loop (chained so XLA cannot hoist it), one
forced scalar read at the end, empty-loop baseline subtracted.

Candidates:
  A. vmemgather : arbitrary gather from a VMEM-resident table inside a
                  Pallas kernel (several lowering formulations).
  B. ktile      : transpose-gather with a K-tile window (range K*128).
  C. lanegather : full-array per-row lane permutation (take_along_axis).
  D. tiledma    : block gather via scalar-prefetch index map (pure DMA).
  E. sort       : lax.sort baseline (what we are replacing).
  F. take       : XLA jnp.take with random indices (judge: ~130ms@9.4M).

Usage: python tools/probe_permute.py [names...]
"""

import functools
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
ITERS = 32


def bench_loop(name, step, init, elems=None, iters=ITERS):
    """step: state -> state, jitted fori_loop, forced read, baseline-sub."""

    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, lambda i, s: step(s), state)

    @jax.jit
    def empty(state):
        return jax.lax.fori_loop(0, iters, lambda i, s: s, state)

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0])

    try:
        t0 = time.perf_counter()
        out = run(init)
        force(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    force(empty(init))
    best = np.inf
    base = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        force(empty(init))
        base = min(base, time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(run(init))
        best = min(best, time.perf_counter() - t0)
    per = (best - base) / iters
    rate = f"({elems / per / 1e9:7.2f} Gelem/s)" if elems else ""
    print(f"{name:44s} compile={compile_s:6.1f}s  {per * 1e3:9.3f} ms/op "
          f"{rate} [base {base * 1e3:.1f}ms]", flush=True)
    return per, out


want = set(sys.argv[1:]) or {"vmemgather", "ktile", "lanegather", "tiledma",
                             "sort", "take"}

L = 1 << 23            # permutation length (8.4M, close to bench's 9.4M)
R = L // 128

# ------------------------------------------------------------------ A
if "vmemgather" in want:
    # table 4MB (1M f32), output L elements with arbitrary indices
    NT = 1 << 20
    tbl = jnp.asarray(rng.random((NT // 128, 128), np.float32))
    idx = rng.integers(0, NT, (R, 128))
    row = jnp.asarray((idx >> 7).astype(np.int32))
    lane = jnp.asarray((idx & 127).astype(np.int32))
    flat = jnp.asarray(idx.astype(np.int32))
    BR = 512

    def mk(body):
        def k(tbl_ref, a_ref, b_ref, o_ref):
            body(tbl_ref, a_ref, b_ref, o_ref)

        @jax.jit
        def g(tbl, a, b):
            return pl.pallas_call(
                k,
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((NT // 128, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(tbl, a, b)

        return g

    # A1: flat reshape + take
    def body_flat(tbl_ref, f_ref, _b, o_ref):
        t = tbl_ref[:].reshape(-1)
        o_ref[:] = jnp.take(t, f_ref[:], axis=0)

    # A2: advanced 2D indexing t[row, lane]
    def body_adv(tbl_ref, r_ref, l_ref, o_ref):
        o_ref[:] = tbl_ref[:][r_ref[:], l_ref[:]]

    # A3: row-gather then lane-select: g = t[row, :] then take_along lane
    def body_rows(tbl_ref, r_ref, l_ref, o_ref):
        t = tbl_ref[:]
        g = jnp.take(t, r_ref[:].reshape(-1), axis=0)  # (BR*128, 128)
        o_ref[:] = jnp.take_along_axis(
            g, l_ref[:].reshape(-1, 1), axis=1).reshape(BR, 128)

    for nm, body, args in [
        ("A1 vmemgather flat-take 4MB tbl", body_flat, (tbl, flat, flat)),
        ("A2 vmemgather adv-index 4MB tbl", body_adv, (tbl, row, lane)),
        ("A3 vmemgather row+lane 4MB tbl", body_rows, (tbl, row, lane)),
    ]:
        g = mk(body)

        def step(s, g=g, a=args[1], b=args[2]):
            t, _ = s
            o = g(t, a, b)
            return (t + o[0, 0] * 1e-30, o)

        r = bench_loop(nm, step, (args[0], jnp.zeros((R, 128), jnp.float32)),
                       elems=L)
        if r is not None:
            _, out = r
            oh = np.asarray(out[1])
            th = np.asarray(tbl).reshape(-1)
            exp = th[idx[0]]  # state was perturbed ~1e-30; close enough
            print("   correct:",
                  bool(np.allclose(oh[0], exp, atol=1e-5)), flush=True)

# ------------------------------------------------------------------ B
if "ktile" in want:
    for K in (2, 4, 8, 16):
        W = K * 128
        tblk = jnp.asarray(rng.random((W, 128), np.float32))
        idxk = jnp.asarray(rng.integers(0, W, (R, 128)).astype(np.int32))
        BR = 256

        def kk(tbl_ref, idx_ref, o_ref, K=K, W=W, BR=BR):
            tt = tbl_ref[:].T  # (128, W)
            for s in range(BR // 128):
                ix = idx_ref[s * 128:(s + 1) * 128, :]
                g = jnp.take_along_axis(tt, ix.T, axis=1)
                o_ref[s * 128:(s + 1) * 128, :] = g.T

        @jax.jit
        def gk(tbl, idx, kk=kk, W=W, BR=BR):
            return pl.pallas_call(
                kk,
                grid=(R // BR,),
                in_specs=[
                    pl.BlockSpec((W, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(tbl, idx)

        def stepk(s, gk=gk, idxk=idxk):
            t, _ = s
            o = gk(t, idxk)
            return (t + o[0, 0] * 1e-30, o)

        bench_loop(f"B ktile K={K} (range {W})", stepk,
                   (tblk, jnp.zeros((R, 128), jnp.float32)), elems=L)

# ------------------------------------------------------------------ C
if "lanegather" in want:
    perm = np.argsort(rng.random((R, 128)), axis=1).astype(np.int32)
    permj = jnp.asarray(perm)
    BR = 512

    def kc(v_ref, p_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(v_ref[:], p_ref[:], axis=1)

    @jax.jit
    def gc(v, p):
        return pl.pallas_call(
            kc,
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
        )(v, p)

    bench_loop("C lanegather full-array rowwise perm",
               lambda v: gc(v, permj),
               jnp.asarray(rng.random((R, 128), np.float32)), elems=L)

# ------------------------------------------------------------------ D
if "tiledma" in want:
    # out block b = in block src[b]: block-level permutation, pure DMA
    for TB in (8, 32, 128):
        NB = R // TB
        src = jnp.asarray(rng.permutation(NB).astype(np.int32))

        def kd(src_ref, v_ref, o_ref):
            o_ref[:] = v_ref[:]

        @jax.jit
        def gd(src, v, kd=kd, TB=TB, NB=NB):
            grid_spec = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(NB,),
                in_specs=[pl.BlockSpec((TB, 128), lambda i, s: (s[i], 0))],
                out_specs=pl.BlockSpec((TB, 128), lambda i, s: (i, 0)),
            )
            return pl.pallas_call(
                kd, grid_spec=grid_spec,
                out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
            )(src, v)

        bench_loop(f"D tiledma block-perm TB={TB} ({TB * 128 * 4}B)",
                   lambda v, gd=gd, src=src: gd(src, v),
                   jnp.asarray(rng.random((R, 128), np.float32)), elems=L)

# ------------------------------------------------------------------ E
if "sort" in want:
    keys = jnp.asarray(rng.permutation(L).astype(np.int32))

    def ste(s):
        k, v, h = s
        _, v2, h2 = jax.lax.sort((k, v, h), num_keys=1)
        return (k, v2, h2)

    bench_loop("E lax.sort key+2payload", ste,
               (keys, jnp.asarray(rng.random(L, np.float32)),
                jnp.zeros(L, jnp.int32)), elems=L)

# ------------------------------------------------------------------ F
if "take" in want:
    gidx = jnp.asarray(rng.integers(0, L, L).astype(np.int32))

    def stf(v):
        return jnp.take(v, gidx)

    bench_loop("F xla take random idx", stf,
               jnp.asarray(rng.random(L, np.float32)), elems=L)
