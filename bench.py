"""Benchmark: masked semiring SpMV throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json config #1/#3 shape): BFS-style masked lor_second
SpMV and PageRank plus_times SpMV over a random power-law-ish graph.
Layout is pull-style CSC-ish: edges sorted by destination so the
segment-reduce runs with sorted indices (the TPU-friendly lowering — an
unsorted scatter-add lowers to a serial scatter loop on TPU).  The metric is
GnnZ/s = stored edges processed per second, the memory-bandwidth-bound figure
the north star targets.  The reference publishes no numbers (BASELINE.md) so
vs_baseline is 1.0 (we are the baseline).
"""

import json
import os
import sys
import time

import numpy as np


def build_graph(n, avg_deg, seed=0):
    rng = np.random.default_rng(seed)
    nnz = n * avg_deg
    src = rng.integers(0, n, nnz)
    dst = (rng.zipf(1.5, nnz) - 1) % n
    keep = src != dst
    src, dst = src[keep], dst[keep]
    lin = np.unique(dst.astype(np.int64) * n + src)  # sorted by dst, dedup
    dst = (lin // n).astype(np.int32)
    src = (lin % n).astype(np.int32)
    return src, dst


def main():
    import jax
    import jax.numpy as jnp

    n = int(os.environ.get("BENCH_N", 1 << 17))
    avg_deg = int(os.environ.get("BENCH_DEG", 16))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    src, dst = build_graph(n, avg_deg)
    nnz = len(src)

    srcs = jnp.asarray(src)
    dsts = jnp.asarray(dst)
    vals = jnp.ones(nnz, jnp.float32)
    x0 = jnp.asarray(
        (np.random.default_rng(1).random(n) < 0.05).astype(np.float32))
    rank0 = jnp.full((n,), 1.0 / n, jnp.float32)

    def bfs_spmv_body(x):
        # y_j = OR over in-edges (i->j) of x_i: count>0 (lor_second pattern)
        prods = jnp.take(x, srcs, axis=0)
        y = jax.ops.segment_sum(prods, dsts, num_segments=n,
                                indices_are_sorted=True)
        return jnp.where(y > 0, 1.0, 0.0)

    def pagerank_spmv_body(rank):
        prods = vals * jnp.take(rank, srcs, axis=0)
        y = jax.ops.segment_sum(prods, dsts, num_segments=n,
                                indices_are_sorted=True)
        return 0.85 * y + 0.15 / n

    # fuse `iters` applications into ONE dispatch so tunnel/dispatch latency
    # doesn't pollute the throughput measurement
    @jax.jit
    def bfs_spmv(x):
        return jax.lax.fori_loop(0, iters, lambda i, c: bfs_spmv_body(c), x)

    @jax.jit
    def pagerank_spmv(r):
        return jax.lax.fori_loop(0, iters, lambda i, c: pagerank_spmv_body(c), r)

    t0 = time.perf_counter()
    bfs_spmv(x0).block_until_ready()
    compile_bfs = time.perf_counter() - t0
    t0 = time.perf_counter()
    pagerank_spmv(rank0).block_until_ready()
    compile_pr = time.perf_counter() - t0

    def time_loop(fn, x):
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            fn(x).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    t_bfs = time_loop(bfs_spmv, x0)
    t_pr = time_loop(pagerank_spmv, rank0)

    t = min(t_bfs, t_pr)
    gnnz_s = nnz / t / 1e9
    result = {
        "metric": "masked SpMV throughput (best of lor_second/plus_times)",
        "value": round(gnnz_s, 4),
        "unit": "GnnZ/s",
        "vs_baseline": 1.0,
        "detail": {
            "n": n,
            "nnz": nnz,
            "bfs_spmv_ms": round(t_bfs * 1e3, 3),
            "pagerank_spmv_ms": round(t_pr * 1e3, 3),
            "compile_s": [round(compile_bfs, 1), round(compile_pr, 1)],
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
