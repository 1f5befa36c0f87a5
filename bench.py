"""Benchmark: masked semiring SpMV throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json configs #1/#3): BFS-style lor_second SpMV and
PageRank plus_times SpMV over a random graph, 20 iterations fused into one
dispatch.  Two formulations are measured and the best is reported:

1. "seg": pull-style dst-sorted edges; gather x[src] + sorted segment-sum
   (via exclusive-cumsum + boundary diff, which avoids TPU scatter).
2. "hybrid": TPU gathers are the bottleneck, so edges are grouped by
   128-wide src chunk at build time; the gather becomes a batched
   take_along_axis into (chunk, 128) tiles (~4x faster than a flat gather),
   products are routed to destination order with an on-device
   sort_key_val (the one fixed permutation per graph), then reduced with
   the cumsum trick.

Metric: GnnZ/s = stored edges processed per second.  The reference
publishes no numbers (BASELINE.md) so vs_baseline is 1.0.
"""

import json
import os
import time

import numpy as np


def build_graph(n, avg_deg, seed=0):
    rng = np.random.default_rng(seed)
    nnz = n * avg_deg
    src = rng.integers(0, n, nnz)
    dst = (rng.zipf(1.5, nnz) - 1) % n
    keep = src != dst
    src, dst = src[keep], dst[keep]
    lin = np.unique(dst.astype(np.int64) * n + src)  # sorted by dst
    dst = (lin // n).astype(np.int32)
    src = (lin % n).astype(np.int32)
    return src, dst


def main():
    import jax

    jax.config.update("jax_enable_x64", True)  # exact f64 cumsum accumulators
    import jax.numpy as jnp

    n = int(os.environ.get("BENCH_N", 1 << 17))
    avg_deg = int(os.environ.get("BENCH_DEG", 16))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    src, dst = build_graph(n, avg_deg)
    nnz = len(src)

    # --- formulation 1: dst-sorted edges, flat gather + cumsum segment sum
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, dst + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    srcs = jnp.asarray(src)
    ipj = jnp.asarray(indptr)
    vals = jnp.ones(nnz, jnp.float32)

    def seg_sum_sorted(prods, ip):
        cs = jnp.concatenate(
            [jnp.zeros((1,), jnp.float64), jnp.cumsum(prods.astype(jnp.float64))])
        return (jnp.take(cs, ip[1:]) - jnp.take(cs, ip[:-1])).astype(jnp.float32)

    def spmv_seg(x):
        prods = vals * jnp.take(x, srcs, axis=0)
        return seg_sum_sorted(prods, ipj)

    # --- formulation 2: src-chunk-grouped gather + sort-route + cumsum
    CHUNK = 128
    order = np.lexsort((dst, src))  # by src, then dst
    s2, d2 = src[order], dst[order]
    chunk_of = s2 // CHUNK
    C = (n + CHUNK - 1) // CHUNK
    counts = np.bincount(chunk_of, minlength=C)
    cap = max(1, int(counts.max()))
    # slot of each src-sorted edge within its chunk row
    slot = np.arange(nnz) - np.concatenate([[0], np.cumsum(counts)])[chunk_of]
    # the base edge list is dst-sorted, and order maps src-rank -> dst-rank,
    # so the route key (target position in dst order) of src-rank k is order[k]
    idx_local = np.zeros((C, cap), np.int32)
    route_key = np.full((C, cap), np.int32(C * cap), np.int32)  # pads sort last
    vals2 = np.zeros((C, cap), np.float32)
    idx_local[chunk_of, slot] = (s2 % CHUNK).astype(np.int32)
    route_key[chunk_of, slot] = order.astype(np.int32)
    vals2[chunk_of, slot] = 1.0
    xj_shape = C * CHUNK
    idxj = jnp.asarray(idx_local)
    keyj = jnp.asarray(route_key.reshape(-1))
    valsj = jnp.asarray(vals2.reshape(-1))

    def spmv_hybrid(x):
        x2 = jnp.pad(x, (0, xj_shape - n)).reshape(C, CHUNK)
        gathered = jnp.take_along_axis(x2, idxj, axis=1).reshape(-1)
        prods = valsj * gathered
        _, routed = jax.lax.sort_key_val(keyj, prods)
        return seg_sum_sorted(routed[:nnz], ipj)

    def pagerank_body(spmv):
        damp = jnp.float32(0.85)
        tele = jnp.float32(0.15 / n)

        def body(r):
            y = spmv(r)
            return damp * y + tele

        return body

    def bfs_body(spmv):
        one = jnp.float32(1.0)
        zero = jnp.float32(0.0)

        def body(x):
            return jnp.where(spmv(x) > 0, one, zero)

        return body

    x0 = jnp.asarray(
        (np.random.default_rng(1).random(n) < 0.05).astype(np.float32))
    rank0 = jnp.full((n,), 1.0 / n, jnp.float32)

    # correctness cross-check: both formulations must agree
    ref = np.asarray(jax.jit(spmv_seg)(rank0))
    hyb = np.asarray(jax.jit(spmv_hybrid)(rank0))
    np.testing.assert_allclose(ref, hyb, rtol=1e-5, atol=1e-9)

    results = {}
    compile_s = {}
    for name, spmv in [("seg", spmv_seg), ("hybrid", spmv_hybrid)]:
        for wname, bodyf, x in [("bfs", bfs_body, x0), ("pr", pagerank_body, rank0)]:
            f = jax.jit(lambda c, body=bodyf(spmv): jax.lax.fori_loop(
                0, iters, lambda i, cur: body(cur), c))
            t0 = time.perf_counter()
            f(x).block_until_ready()
            compile_s[f"{name}_{wname}"] = round(time.perf_counter() - t0, 1)
            best = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                f(x).block_until_ready()
                best = min(best, (time.perf_counter() - t0) / iters)
            results[f"{name}_{wname}"] = best

    t = min(results.values())
    gnnz_s = nnz / t / 1e9
    result = {
        "metric": "masked SpMV throughput (best formulation/workload)",
        "value": round(gnnz_s, 4),
        "unit": "GnnZ/s",
        "vs_baseline": 1.0,
        "detail": {
            "n": n,
            "nnz": nnz,
            "ms_per_spmv": {k: round(v * 1e3, 3) for k, v in results.items()},
            "compile_s": compile_s,
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
