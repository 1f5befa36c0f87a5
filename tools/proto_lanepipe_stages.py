"""Time each lanepipe stage separately on the chip."""

import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_graph  # noqa: E402
from graphblas_tpu.core.engine import lanepipe as lp  # noqa: E402
import graphblas_tpu as gb  # noqa: E402

n = int(os.environ.get("N", 1 << 19))
src, dst = build_graph(n, 8)
nnz = len(src)
outdeg = np.bincount(src, minlength=n).astype(np.float32)
w = (1.0 / outdeg[src]).astype(np.float32)
plan = lp.build_plan(dst.astype(np.int64), src.astype(np.int64), w, n, n)
print(f"n={n} nnz={nnz} L={plan['L']} R_g={plan['R_g']} V={plan['V']}")

dev = {k: jnp.asarray(v.astype(np.int32) if v.dtype == bool else v)
       for k, v in plan.items() if isinstance(v, np.ndarray)}

ring = gb.semiring.plus_times["FP32"]
mult = ring.binaryop
mono = ring.monoid
FP32 = gb.dtypes.FP32

R_g, L, R_scan, V = plan["R_g"], plan["L"], plan["R_scan"], plan["V"]
R2, L2 = plan.get("R2"), plan.get("L2")
nblocks = plan["nblocks_g"]
Ru = lp._ceil_to(n, lp.WINDOW_K) // 128

rng = np.random.default_rng(0)
u2 = jnp.asarray(rng.random((Ru, 128), np.float32))
u2ok = jnp.ones((Ru, 128), jnp.int32)


def timeit(name, f, *args, reps=5):
    out = f(*args)
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} {best*1e3:9.3f} ms")
    return out


@jax.jit
def k1(wbase, locidx, okg, avals, u2, u2ok):
    return lp.gather_mult((wbase, locidx, okg, avals), u2, u2ok, mult,
                          FP32, FP32, mono, kind="vxm", R_g=R_g,
                          nblocks=nblocks)


prods, okp = timeit("k1 gather_mult", k1, dev["wbase"], dev["locidx_g"],
                    dev["okg"], dev["avals_g"], u2, u2ok)


@jax.jit
def route(route_r, pf, hf):
    pad = L - R_g * 128
    pf = jnp.concatenate([pf.reshape(-1), jnp.zeros(pad, jnp.float32)])
    hf = jnp.concatenate([hf.reshape(-1), jnp.zeros(pad, jnp.int32)])
    return jax.lax.sort((route_r, pf, hf), num_keys=1)


_, pv, ph = timeit("route sort (3-op)", route, dev["route"], prods, okp)


@jax.jit
def route2(route_r, pf):
    pad = L - R_g * 128
    pf = jnp.concatenate([pf.reshape(-1), jnp.zeros(pad, jnp.float32)])
    return jax.lax.sort((route_r, pf), num_keys=1)


timeit("route sort (2-op)", route2, dev["route"], prods)

pv2 = pv.reshape(R_scan, 128)
ph2 = ph.reshape(R_scan, 128)


@jax.jit
def scan(bar, v, h):
    return lp.lane_segscan(bar, v, h, lambda a, b: a + b)


s_v, s_h = timeit("lane_segscan", scan, dev["barrier"], pv2, ph2)


@jax.jit
def extsort(ext, v, h):
    return jax.lax.sort((ext, v.reshape(-1), h.reshape(-1)), num_keys=1)


timeit("ext sort (3-op)", extsort, dev["ext_rank"], s_v, s_h)

if R2:
    bar2 = dev["bar2"]
    tv2 = jnp.asarray(rng.random((R2, 128), np.float32))
    th2 = jnp.ones((R2, 128), jnp.int32)
    timeit("scan2", scan, bar2, tv2, th2)

    @jax.jit
    def ext2sort(ext, v, h):
        return jax.lax.sort((ext, v.reshape(-1), h.reshape(-1)), num_keys=1)

    timeit("ext2 sort", ext2sort, dev["ext2"],
           jnp.asarray(rng.random(L2, np.float32)),
           jnp.ones(L2, jnp.int32))


# ---- composition bisection
def mk(upto):
    @jax.jit
    def f(wbase, locidx, okg, avals, u2, u2ok, route_r, bar, ext, u_vals):
        u_valid = jnp.ones(n, bool)
        prods, okp = lp.gather_mult((wbase, locidx, okg, avals), u2, u2ok,
                                    mult, FP32, FP32, mono, kind="vxm",
                                    R_g=R_g, nblocks=nblocks)
        if upto == 1:
            return prods, okp
        pad = L - R_g * 128
        pf = jnp.concatenate([prods.reshape(-1), jnp.zeros(pad, jnp.float32)])
        hf = jnp.concatenate([okp.reshape(-1), jnp.zeros(pad, jnp.int32)])
        _, pv, ph = jax.lax.sort((route_r, pf, hf), num_keys=1)
        if upto == 2:
            return pv, ph
        s_v, s_h = lp.lane_segscan(bar, pv.reshape(R_scan, 128),
                                   ph.reshape(R_scan, 128),
                                   lambda a, b: a + b)
        if upto == 3:
            return s_v, s_h
        _, e_v, e_h = jax.lax.sort((ext, s_v.reshape(-1), s_h.reshape(-1)),
                                   num_keys=1)
        return e_v[:n], e_h[:n]
    return f


uv = jnp.asarray(rng.random(n, np.float32))
for upto in (1, 2, 3, 4):
    f = mk(upto)
    timeit(f"compose upto {upto}", f, dev["wbase"], dev["locidx_g"],
           dev["okg"], dev["avals_g"], u2, u2ok, dev["route"],
           dev["barrier"], dev["ext_rank"], uv)

# full pipeline function under x64 scope (as the funnel runs it)
meta = {k: v for k, v in plan.items() if not isinstance(v, np.ndarray)}
entry = {"dev": dev}
entry.update(meta)
pdyn = lp.plan_dyn_tuple(entry)


@jax.jit
def full(pdyn, uvals):
    return lp.spmv_pipeline(pdyn, meta, uvals, jnp.ones(n, bool), ring,
                            FP32, FP32, kind="vxm")


with jax.enable_x64(True):
    timeit("full spmv_pipeline (x64 scope)", full, pdyn, uv)
timeit("full spmv_pipeline (no x64)", full, pdyn, uv)
