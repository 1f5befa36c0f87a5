"""Time each lanepipe matvec stage at bench shapes (forced protocol)."""

import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import graphblas_tpu as gb  # noqa: E402
from graphblas_tpu.core.engine import lanepipe as lp  # noqa: E402
from graphblas_tpu.core.engine import permute as pm  # noqa: E402
from graphblas_tpu.core.engine import sortpipe as sp  # noqa: E402

ITERS = 24


def bench_loop(name, step, init, iters=ITERS):
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
        print(f"{name:40s} FAILED: {type(e).__name__}: {str(e)[:160]}",
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
    print(f"{name:40s} compile={compile_s:6.1f}s  {per * 1e3:9.3f} ms/op "
          f"[base {base * 1e3:.1f}ms]", flush=True)
    return per


def build_graph(n, avg_deg, seed=0):
    rng = np.random.default_rng(seed)
    nnz = n * avg_deg
    src = rng.integers(0, n, nnz)
    dst = (rng.zipf(1.5, nnz) - 1) % n
    keep = src != dst
    src, dst = src[keep], dst[keep]
    base = np.arange(n, dtype=np.int64)
    src = np.concatenate([src, base, base])
    dst = np.concatenate([dst, (base + 1) % n, (base * 2 + 1) % n])
    lin = np.unique(src.astype(np.int64) * n + dst)
    return (lin // n).astype(np.int64), (lin % n).astype(np.int64)


def main():
    n = 1 << 19
    src, dst = build_graph(n, 8)
    nnz = len(src)
    outdeg = np.bincount(src, minlength=n).astype(np.float32)
    w = (1.0 / outdeg[src]).astype(np.float32)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(src, dst, w, dtype="FP32", nrows=n, ncols=n)
    spstore = A._sparse
    t0 = time.time()
    entry = lp.get_plan(spstore, False)  # vxm: dest = cols
    print(f"plan: {time.time() - t0:.1f}s  L={entry['L']} R_g={entry['R_g']} "
          f"V={entry['V']} two_level={entry['two_level']} nnz={nnz}",
          flush=True)
    ring = gb.semiring.plus_times["FP32"]
    dt = gb.dtypes.FP32
    plan_dyn = lp.plan_dyn_tuple(entry)
    u = jnp.asarray(np.random.default_rng(1).random(n).astype(np.float32))
    uv = jnp.ones(n, bool)

    # full pipeline
    def full(s):
        out, ok = lp.spmv_pipeline(plan_dyn, entry, s, uv, ring, dt, dt,
                                   kind="vxm")
        return out

    bench_loop("full spmv_pipeline", full, u)

    # stage: gather_mult only
    meta = entry
    L, R_g = meta["L"], meta["R_g"]
    (gmeta, idx1, locidx, okg, avals, barrier, oks, routeP, extP,
     out_ok) = plan_dyn[:10]
    mult, mono = ring.binaryop, ring.monoid
    Ru = lp._ceil_to(max(n, 1), lp.WINDOW_K) // 128

    def gm(s):
        u2 = s.reshape(Ru, 128)
        u2ok = jnp.ones((Ru, 128), jnp.int32)
        prods, okp = lp.gather_mult((gmeta, idx1, locidx, okg, avals), u2,
                                    u2ok, mult, dt, dt, mono, kind="vxm",
                                    R_g=R_g, nblocks=meta["nblocks_g"],
                                    packed=False, full_u=True)
        return prods.reshape(-1)[:n]

    pad = Ru * 128 - n
    up = jnp.concatenate([u, jnp.zeros(pad, jnp.float32)])
    bench_loop("gather_mult", gm, up)

    # stage: route perm (2ch)
    pf = jnp.asarray(np.random.default_rng(2).random(L).astype(np.float32))
    hf = jnp.ones(L, jnp.int32)

    def route2(s):
        v, h = pm.apply_perm(meta["permmeta"]["routeP"], routeP,
                             [s.reshape(-1, 128), hf.reshape(-1, 128)],
                             use_pallas=True, interpret=False)
        return v.reshape(-1)

    bench_loop("route perm 2ch", route2, pf)

    def route1(s):
        v, = pm.apply_perm(meta["permmeta"]["routeP"], routeP,
                           [s.reshape(-1, 128)],
                           use_pallas=True, interpret=False)
        return v.reshape(-1)

    bench_loop("route perm 1ch", route1, pf)

    # the production fast-path decomposition
    comb_f = sp.monoid_scan_fn("plus", np.float32)

    def route_pre_c(s):
        y, = pm.apply_perm_pre_c(meta["permmeta"]["routeP"], routeP,
                                 [s.reshape(-1, 128)], interpret=False)
        return y.reshape(-1)

    bench_loop("route pre_c (A+x+B+x)", route_pre_c, pf)

    def fusedk(s):
        y = lp.fused_permC_scan_permA(routeP[2], barrier, extP[0],
                                      s.reshape(-1, 128), comb_f)
        return y.reshape(-1)

    bench_loop("fused routeC+scan+extA", fusedk, pf)

    lim1 = meta.get("L2req") if meta["two_level"] else meta["n_out"]

    def ext_post_a(s):
        y, = pm.apply_perm_post_a(meta["permmeta"]["extP"], extP,
                                  [s.reshape(-1, 128)], interpret=False,
                                  out_limit=lim1)
        return y.reshape(-1)

    bench_loop("ext post_a (x+B+x+C, lim)", ext_post_a, pf)

    # route sub-stages (1ch)
    pmeta = meta["permmeta"]["routeP"]
    T, T_pad, T128 = pmeta["T"], pmeta["T_pad"], pmeta["T128"]
    pa, pb, pc = routeP

    def stA(s):
        return pm._tile_perm_pallas(pa, [s], False)

    bench_loop("  stage A tileperm 1ch", stA, pf.reshape(-1, 128))

    def xch(s):
        y = s.reshape(T, pm.N_TILE).T
        if T_pad > T:
            y = jnp.pad(y, ((0, 0), (0, T_pad - T)))
        return y.reshape(-1)[:L].reshape(-1, 128)

    bench_loop("  exchange transpose(+pad)", xch, pf.reshape(-1, 128))

    mid0 = jnp.asarray(np.random.default_rng(3).random(
        (pm.N_TILE, T_pad)).astype(np.float32))

    def stB(s):
        return pm._mid_perm_pallas(pb, [s], T128, T_pad, False)

    bench_loop("  stage B midperm 1ch", stB, mid0)

    # stage: scan
    z = jnp.asarray(np.random.default_rng(4).random(
        (L // 128, 128)).astype(np.float32))
    h2 = jnp.ones((L // 128, 128), jnp.int32)
    comb = sp.monoid_scan_fn("plus", np.float32)

    def scan(s):
        v, h = lp.lane_segscan(barrier, s, h2, comb)
        return v

    bench_loop("lane_segscan 512", scan, z)

    # stage: extract perm 2ch
    def ext2(s):
        v, h = pm.apply_perm(meta["permmeta"]["extP"], extP,
                             [s, h2], use_pallas=True, interpret=False)
        return v

    bench_loop("extract perm 2ch", ext2, z)


main()
