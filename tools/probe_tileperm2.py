"""Optimize the within-tile-perm pass: blocking/idx-layout variants."""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
ITERS = 32
L = 1 << 23
R = L // 128
T = R // 128


def bench_loop(name, step, init, elems=None, iters=ITERS):
    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, lambda i, s: step(s), state)

    @jax.jit
    def empty(state):
        return jax.lax.fori_loop(0, iters, lambda i, s: s, state)

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0].astype(jnp.float32))

    try:
        t0 = time.perf_counter()
        out = run(init)
        force(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        print(f"{name:52s} FAILED: {type(e).__name__}: {str(e)[:140]}",
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
    print(f"{name:52s} compile={compile_s:6.1f}s  {per * 1e3:9.3f} ms/op "
          f"{rate} [base {base * 1e3:.1f}ms]", flush=True)
    return per


vals = jnp.asarray(rng.random((R, 128), np.float32))
a_ = np.argsort(rng.random((R, 128)), axis=1).astype(np.int32)
b_ = np.argsort(rng.random((R, 128)), axis=1).astype(np.int32)
c_ = np.argsort(rng.random((R, 128)), axis=1).astype(np.int32)
packed = jnp.asarray(a_ | (b_ << 7) | (c_ << 14))
aj, bj, cj = jnp.asarray(a_), jnp.asarray(b_), jnp.asarray(c_)

want = set(sys.argv[1:]) or {"v1", "v2", "v3", "v4", "v5"}


def tp_body(x, a, b, c):
    y = jnp.take_along_axis(x, a, axis=1)
    y = y.T
    y = jnp.take_along_axis(y, b, axis=1)
    y = y.T
    return jnp.take_along_axis(y, c, axis=1)


# v1: BR=512 block, loop 4 tiles, packed idx
if "v1" in want:
    BR = 512

    def k1(v_ref, p_ref, o_ref):
        for s in range(BR // 128):
            sl = slice(s * 128, (s + 1) * 128)
            idx = p_ref[sl, :]
            a = idx & 127
            b = (idx >> 7) & 127
            c = (idx >> 14) & 127
            o_ref[sl, :] = tp_body(v_ref[sl, :], a, b, c)

    @jax.jit
    def g1(v, p):
        return pl.pallas_call(
            k1, grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))(v, p)

    bench_loop("v1 BR=512 packed", lambda v: g1(v, packed), vals, elems=L)

# v2: BR=512, 3 separate idx arrays
if "v2" in want:
    BR = 512

    def k2(v_ref, a_ref, b_ref, c_ref, o_ref):
        for s in range(BR // 128):
            sl = slice(s * 128, (s + 1) * 128)
            o_ref[sl, :] = tp_body(v_ref[sl, :], a_ref[sl, :], b_ref[sl, :],
                                   c_ref[sl, :])

    @jax.jit
    def g2(v, a, b, c):
        return pl.pallas_call(
            k2, grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))] * 4,
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))(v, a, b, c)

    bench_loop("v2 BR=512 3-idx", lambda v: g2(v, aj, bj, cj), vals, elems=L)

# v3: BR=1024 packed
if "v3" in want:
    BR = 1024

    def k3(v_ref, p_ref, o_ref):
        for s in range(BR // 128):
            sl = slice(s * 128, (s + 1) * 128)
            idx = p_ref[sl, :]
            a = idx & 127
            b = (idx >> 7) & 127
            c = (idx >> 14) & 127
            o_ref[sl, :] = tp_body(v_ref[sl, :], a, b, c)

    @jax.jit
    def g3(v, p):
        return pl.pallas_call(
            k3, grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))(v, p)

    bench_loop("v3 BR=1024 packed", lambda v: g3(v, packed), vals, elems=L)

# v4: gather-only x3 (no transposes) as ALU-cost reference
if "v4" in want:
    BR = 512

    def k4(v_ref, p_ref, o_ref):
        for s in range(BR // 128):
            sl = slice(s * 128, (s + 1) * 128)
            idx = p_ref[sl, :]
            a = idx & 127
            b = (idx >> 7) & 127
            c = (idx >> 14) & 127
            y = jnp.take_along_axis(v_ref[sl, :], a, axis=1)
            y = jnp.take_along_axis(y, b, axis=1)
            o_ref[sl, :] = jnp.take_along_axis(y, c, axis=1)

    @jax.jit
    def g4(v, p):
        return pl.pallas_call(
            k4, grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))(v, p)

    bench_loop("v4 BR=512 3 gathers no transp", lambda v: g4(v, packed),
               vals, elems=L)

# v5: single gather + single transpose (per-pass lower bound shape)
if "v5" in want:
    BR = 512

    def k5(v_ref, p_ref, o_ref):
        for s in range(BR // 128):
            sl = slice(s * 128, (s + 1) * 128)
            idx = p_ref[sl, :] & 127
            y = jnp.take_along_axis(v_ref[sl, :], idx, axis=1)
            o_ref[sl, :] = y.T

    @jax.jit
    def g5(v, p):
        return pl.pallas_call(
            k5, grid=(R // BR,),
            in_specs=[pl.BlockSpec((BR, 128), lambda i: (i, 0))] * 2,
            out_specs=pl.BlockSpec((BR, 128), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32))(v, p)

    bench_loop("v5 BR=512 gather+transpose", lambda v: g5(v, packed),
               vals, elems=L)
