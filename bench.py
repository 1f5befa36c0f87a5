"""Benchmark: masked semiring SpMV throughput on one TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.json configs #1/#3): PageRank plus_times semiring SpMV
over a random power-law graph, BENCH_ITERS iterations fused into one
dispatch (a BFS lor_second sweep is the same kernel shape with a compare).

Formulation ("hybrid", chosen over a plain gather+segment-sum after
measuring both): TPU flat gathers are the bottleneck, so edges are grouped
by 128-wide src chunk at build time; the x-gather becomes a batched
take_along_axis into (chunk, 128) tiles, products are routed to destination
order with ONE precomputed permutation gather (the permutation is fixed per
graph, so no runtime sort), then per-destination sums come from a two-level
cumsum: f32 cumsum within 2048-wide blocks + f64 exclusive block offsets
(block count is tiny, so f64 emulation on TPU is free), subtracting at row
boundaries (indptr).  This avoids TPU scatter entirely.

Metric: GnnZ/s = stored edges processed per second.  The reference
publishes no numbers (BASELINE.md, SURVEY §6) so vs_baseline is 1.0.

Env knobs: BENCH_N (default 2^17), BENCH_DEG (16), BENCH_ITERS (20),
BENCH_MODE=hybrid|seg|all (default hybrid: ONE jit compile, so the run
stays fast on a tunneled TPU backend).
"""

import json
import os
import time

import numpy as np

BLOCK = 2048


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

    jax.config.update("jax_enable_x64", True)  # f64 block offsets
    import jax.numpy as jnp

    n = int(os.environ.get("BENCH_N", 1 << 17))
    avg_deg = int(os.environ.get("BENCH_DEG", 16))
    iters = int(os.environ.get("BENCH_ITERS", 20))
    mode = os.environ.get("BENCH_MODE", "hybrid")
    src, dst = build_graph(n, avg_deg)
    nnz = len(src)

    # --- shared: per-destination segment sum of dst-ordered products.
    # Pad nnz to a BLOCK multiple; local f32 cumsum per block + f64 exclusive
    # block offsets (few thousand elements -> cheap even emulated).
    npad = (nnz + BLOCK - 1) // BLOCK * BLOCK
    nblocks = npad // BLOCK
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, dst + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    ipj = jnp.asarray(indptr)

    blk_of = jnp.asarray((indptr.astype(np.int64) // BLOCK).astype(np.int32))
    pos_of = jnp.asarray((indptr.astype(np.int64) % BLOCK).astype(np.int32))

    def seg_sum_sorted(prods):
        """prods: (nnz,) in dst order -> (n,) per-dst sums.

        Cumsum values are only evaluated at the n+1 row boundaries, so the
        f64 work is O(nblocks + n), never O(nnz).
        """
        p = jnp.pad(prods, (0, npad - nnz)).reshape(nblocks, BLOCK)
        local = jnp.cumsum(p, axis=1)  # f32, block-local
        offs = jnp.concatenate([
            jnp.zeros((1,), jnp.float64),
            jnp.cumsum(local[:, -1].astype(jnp.float64)),
        ])  # (nblocks+1,) exclusive block prefix
        # exclusive local cumsum with a zero row for boundary == npad
        localx = jnp.pad(local, ((0, 1), (1, 0)))
        cs = offs[blk_of] + localx[blk_of, pos_of].astype(jnp.float64)
        return (cs[1:] - cs[:-1]).astype(jnp.float32)

    # --- formulation "seg": flat gather of x[src] in dst order
    srcs = jnp.asarray(src)
    vals_seg = jnp.ones(nnz, jnp.float32)

    def spmv_seg(x):
        prods = vals_seg * jnp.take(x, srcs, axis=0)
        return seg_sum_sorted(prods)

    # --- formulation "hybrid": src-chunked gather + fixed-permutation route
    CHUNK = 128
    order = np.lexsort((dst, src))  # edge ids (in dst order) sorted by src
    s2 = src[order]
    chunk_of = s2 // CHUNK
    C = (n + CHUNK - 1) // CHUNK
    counts = np.bincount(chunk_of, minlength=C)
    cap = max(1, int(counts.max()))
    slot = np.arange(nnz) - np.concatenate([[0], np.cumsum(counts)])[chunk_of]
    idx_local = np.zeros((C, cap), np.int32)
    vals2 = np.zeros((C, cap), np.float32)
    # flat slot (src order, padded grid) of each dst-ordered edge
    flat_pos = np.empty(nnz, np.int64)
    flat_pos[order] = chunk_of * cap + slot
    idx_local[chunk_of, slot] = (s2 % CHUNK).astype(np.int32)
    vals2[chunk_of, slot] = 1.0
    xj_shape = C * CHUNK
    idxj = jnp.asarray(idx_local)
    valsj = jnp.asarray(vals2.reshape(-1))
    permj = jnp.asarray(flat_pos.astype(np.int32))

    def spmv_hybrid(x):
        x2 = jnp.pad(x, (0, xj_shape - n)).reshape(C, CHUNK)
        gathered = jnp.take_along_axis(x2, idxj, axis=1).reshape(-1)
        prods = valsj * gathered
        routed = jnp.take(prods, permj)  # fixed permutation, no runtime sort
        return seg_sum_sorted(routed)

    def pagerank_body(spmv):
        damp = jnp.float32(0.85)
        tele = jnp.float32(0.15 / n)

        def body(x):
            return damp * spmv(x) + tele

        return body

    rank0 = jnp.full((n,), 1.0 / n, jnp.float32)

    # host oracle for one SpMV application (cheap, no extra jit)
    r0 = np.full(n, 1.0 / n, np.float32)
    oracle = np.zeros(n, np.float64)
    np.add.at(oracle, dst, r0[src].astype(np.float64))

    forms = {"hybrid": spmv_hybrid, "seg": spmv_seg}
    if mode != "all":
        forms = {mode: forms[mode]}

    results = {}
    compile_s = {}
    for name, spmv in forms.items():
        got = np.asarray(jax.jit(spmv)(rank0))
        np.testing.assert_allclose(got, oracle.astype(np.float32),
                                   rtol=2e-4, atol=1e-10)
        f = jax.jit(lambda c, body=pagerank_body(spmv): jax.lax.fori_loop(
            0, iters, lambda i, cur: body(cur), c))
        t0 = time.perf_counter()
        f(rank0).block_until_ready()
        compile_s[name] = round(time.perf_counter() - t0, 1)
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            f(rank0).block_until_ready()
            best = min(best, (time.perf_counter() - t0) / iters)
        results[name] = best

    t = min(results.values())
    gnnz_s = nnz / t / 1e9
    result = {
        "metric": "masked SpMV throughput (plus_times PageRank sweep)",
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
