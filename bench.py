"""Benchmark: masked semiring SpMV throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json config #1/#3 shape): BFS-style masked lor_second
SpMV and PageRank plus_times SpMV over a random power-law-ish graph in
row-block CSR (edge-parallel gather + segment-reduce), jit-compiled.  The
metric is GnnZ/s = stored edges processed per second, the memory-bandwidth-
bound figure the north star targets.  The reference publishes no numbers
(BASELINE.md) so vs_baseline is reported as 1.0 (we are the baseline).
"""

import json
import sys
import time

import numpy as np


def build_graph(n, avg_deg, seed=0):
    rng = np.random.default_rng(seed)
    nnz = n * avg_deg
    # skewed destinations (power-law-ish) like RMAT
    r = rng.integers(0, n, nnz)
    c = (rng.zipf(1.5, nnz) - 1) % n
    keep = r != c
    r, c = r[keep], c[keep]
    lin = np.unique(r.astype(np.int64) * n + c)
    r = (lin // n).astype(np.int32)
    c = (lin % n).astype(np.int32)
    return r, c


def main():
    import jax
    import jax.numpy as jnp

    n = 1 << 18
    avg_deg = 16
    r, c = build_graph(n, avg_deg)
    nnz = len(r)
    vals = np.ones(nnz, np.float32)

    rowids = jnp.asarray(r)
    cols = jnp.asarray(c)
    v = jnp.asarray(vals)
    x0 = jnp.asarray((np.random.default_rng(1).random(n) < 0.05).astype(np.float32))
    rank0 = jnp.full((n,), 1.0 / n, jnp.float32)

    @jax.jit
    def bfs_spmv(x):
        # y_j = OR over i of (x_i AND A_ij): masked lor_second pattern
        prods = jnp.take(x, rowids, axis=0)
        y = jax.ops.segment_max(prods, cols, num_segments=n)
        return jnp.where(y > 0, 1.0, 0.0)

    @jax.jit
    def pagerank_spmv(rank):
        prods = v * jnp.take(rank, rowids, axis=0)
        y = jax.ops.segment_sum(prods, cols, num_segments=n)
        return 0.85 * y + 0.15 / n

    # warmup / compile
    y = bfs_spmv(x0)
    y.block_until_ready()
    rk = pagerank_spmv(rank0)
    rk.block_until_ready()

    def time_loop(fn, x, iters):
        t0 = time.perf_counter()
        cur = x
        for _ in range(iters):
            cur = fn(cur)
        cur.block_until_ready()
        return (time.perf_counter() - t0) / iters

    iters = 30
    t_bfs = time_loop(bfs_spmv, x0, iters)
    t_pr = time_loop(pagerank_spmv, rank0, iters)

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
            "backend": jax.default_backend(),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
