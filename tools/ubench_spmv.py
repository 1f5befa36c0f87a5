"""Microbenchmark SpMV building blocks on the real TPU chip.

Times (a) the x-gather, (b) the sorted segment-reduce, and (c) fused SpMV
variants, in float32/int32 only (no x64 anywhere). Each variant is its own
jit; prints compile time and best-of-3 steady-state per call.

Usage: python tools/ubench_spmv.py [variant ...]
Variants: take, take_sorted, chunk, segcum, segsum, fused_take, fused_chunk
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

N = 1 << 17
DEG = 16
BLOCK = 512


def build(n=N, deg=DEG, seed=0):
    rng = np.random.default_rng(seed)
    nnz = n * deg
    src = rng.integers(0, n, nnz)
    dst = (rng.zipf(1.5, nnz) - 1) % n
    keep = src != dst
    src, dst = src[keep], dst[keep]
    lin = np.unique(dst.astype(np.int64) * n + src)  # sorted by dst
    dst = (lin // n).astype(np.int32)
    src = (lin % n).astype(np.int32)
    return src, dst


def timeit(name, f, *args, reps=5):
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:28s} compile={compile_s:7.2f}s  run={best*1e3:9.3f}ms")
    return best


def main():
    want = set(sys.argv[1:]) or None
    src, dst = build()
    nnz = len(src)
    n = N
    print(f"backend={jax.default_backend()} n={n} nnz={nnz}")
    x = jnp.asarray(np.random.default_rng(1).random(n, np.float32))
    srcj = jnp.asarray(src)
    vals = jnp.ones(nnz, jnp.float32)

    # dst-sorted indptr
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, dst + 1, 1)
    indptr = np.cumsum(indptr).astype(np.int32)
    ipj = jnp.asarray(indptr)
    dstj = jnp.asarray(dst)

    npad = (nnz + BLOCK - 1) // BLOCK * BLOCK
    nblocks = npad // BLOCK

    def sel(name):
        return want is None or name in want

    # (a) gathers -------------------------------------------------------
    if sel("take"):
        f = jax.jit(lambda x: jnp.take(x, srcj))
        timeit("gather take (unsorted idx)", f, x)
    if sel("take_sorted"):
        order = np.argsort(src, kind="stable")
        s_sorted = jnp.asarray(src[order])
        f = jax.jit(lambda x: jnp.take(x, s_sorted, indices_are_sorted=True))
        timeit("gather take (sorted idx)", f, x)
    if sel("chunk"):
        CH = 128
        order = np.argsort(src, kind="stable")
        s2 = src[order]
        chunk_of = s2 // CH
        C = (n + CH - 1) // CH
        counts = np.bincount(chunk_of, minlength=C)
        cap = max(1, int(counts.max()))
        slot = np.arange(nnz) - np.concatenate([[0], np.cumsum(counts)])[chunk_of]
        idx_local = np.zeros((C, cap), np.int32)
        idx_local[chunk_of, slot] = (s2 % CH).astype(np.int32)
        idxj = jnp.asarray(idx_local)

        def g(x):
            x2 = x.reshape(C, CH)
            return jnp.take_along_axis(x2, idxj, axis=1)

        f = jax.jit(g)
        timeit(f"gather chunked cap={cap}", f, x)

    # (b) segment reduce over dst-sorted products ------------------------
    prods = jnp.asarray(np.random.default_rng(2).random(nnz, np.float32))
    if sel("segcum"):
        blk_of = jnp.asarray((indptr // BLOCK).astype(np.int32))
        pos_of = jnp.asarray((indptr % BLOCK).astype(np.int32))

        def segcum(p):
            p2 = jnp.pad(p, (0, npad - nnz)).reshape(nblocks, BLOCK)
            local = jnp.cumsum(p2, axis=1)
            offs = jnp.concatenate([
                jnp.zeros(1, jnp.float32), jnp.cumsum(local[:, -1])])
            localx = jnp.pad(local, ((0, 1), (1, 0)))
            cs = offs[blk_of] + localx[blk_of, pos_of]
            return cs[1:] - cs[:-1]

        f = jax.jit(segcum)
        timeit("segreduce cumsum-boundary", f, prods)
    if sel("segsum"):
        f = jax.jit(lambda p: jax.ops.segment_sum(
            p, dstj, num_segments=n, indices_are_sorted=True))
        timeit("segreduce segment_sum", f, prods)

    # (c) fused SpMV -----------------------------------------------------
    if sel("fused_take"):
        blk_of = jnp.asarray((indptr // BLOCK).astype(np.int32))
        pos_of = jnp.asarray((indptr % BLOCK).astype(np.int32))

        def spmv(x):
            p = vals * jnp.take(x, srcj)
            p2 = jnp.pad(p, (0, npad - nnz)).reshape(nblocks, BLOCK)
            local = jnp.cumsum(p2, axis=1)
            offs = jnp.concatenate([
                jnp.zeros(1, jnp.float32), jnp.cumsum(local[:, -1])])
            localx = jnp.pad(local, ((0, 1), (1, 0)))
            cs = offs[blk_of] + localx[blk_of, pos_of]
            return cs[1:] - cs[:-1]

        f = jax.jit(spmv)
        t = timeit("spmv take+cumsum", f, x)
        print(f"  -> {nnz/t/1e9:.3f} GnnZ/s")
    if sel("fused_seg"):
        def spmv2(x):
            p = vals * jnp.take(x, srcj)
            return jax.ops.segment_sum(p, dstj, num_segments=n,
                                       indices_are_sorted=True)

        f = jax.jit(spmv2)
        t = timeit("spmv take+segment_sum", f, x)
        print(f"  -> {nnz/t/1e9:.3f} GnnZ/s")


if __name__ == "__main__":
    main()
