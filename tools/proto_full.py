"""Corrected full-pipeline prototype on TPU: plan passed as jit args."""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BC = 128
BR = 256


def segscan_call(barrier, vals, combines):
    L = barrier.shape[0]
    R = L // BC

    def kernel(*refs):
        nv = len(combines)
        b_ref = refs[0]
        v_refs = refs[1:1 + nv]
        o_refs = refs[1 + nv:1 + 2 * nv]
        vcars = refs[1 + 2 * nv:1 + 3 * nv]
        bcar = refs[1 + 3 * nv]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            bcar[0, 0] = 1

        b = b_ref[:] != 0
        vs = [r[:] for r in v_refs]
        lane = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 0)
        for s in [1 << k for k in range(7)]:
            bsh = pltpu.roll(b.astype(jnp.int32), s, 1) != 0
            okm = lane >= s
            vs = [jnp.where(b | ~okm, v, c(pltpu.roll(v, s, 1), v))
                  for v, c in zip(vs, combines)]
            b = b | (okm & bsh)
        for s in [1 << k for k in range(8)]:
            bsh = pltpu.roll(b.astype(jnp.int32), s, 0) != 0
            okm = row >= s
            last_b = jnp.broadcast_to(bsh[:, BC - 1:BC], (BR, BC))
            vs = [jnp.where(b | ~okm, v,
                            c(jnp.broadcast_to(pltpu.roll(v, s, 0)[:, BC - 1:BC],
                                               (BR, BC)), v))
                  for v, c in zip(vs, combines)]
            b = b | (okm & last_b)
        merged = [jnp.where(b | (bcar[0, 0] != 0), v, c(vcar[0, 0], v))
                  for v, c, vcar in zip(vs, combines, vcars)]
        bseen = b | (bcar[0, 0] != 0)
        for o, v in zip(o_refs, merged):
            o[:] = v
        for vcar, v in zip(vcars, merged):
            vcar[0, 0] = v[BR - 1, BC - 1]
        bcar[0, 0] = bseen.astype(jnp.int32)[BR - 1, BC - 1]

    spec = pl.BlockSpec((BR, BC), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[spec] * (1 + len(vals)),
        out_specs=tuple([spec] * len(vals)),
        out_shape=tuple(jax.ShapeDtypeStruct((R, BC), v.dtype) for v in vals),
        scratch_shapes=[pltpu.SMEM((1, 1), v.dtype) for v in vals]
        + [pltpu.SMEM((1, 1), jnp.int32)],
        interpret=jax.default_backend() == "cpu",
    )(barrier.reshape(R, BC), *[v.reshape(R, BC) for v in vals])
    return [o.reshape(L) for o in outs]


def sort_apply(ranks, vals):
    return jax.lax.sort((ranks, vals), num_keys=1)[1]


def _bucket(n, lo=1024):
    cap = lo
    while cap < n:
        cap <<= 1
    return cap


def build_plan(rows, cols, n_out, n_in, cap):
    L = _bucket(max(n_in, n_out) + cap)
    q_order = np.lexsort((rows, cols))
    col_q = cols[q_order]
    indptr_col = np.searchsorted(col_q, np.arange(n_in + 1))
    rank_x = (indptr_col[:-1] + np.arange(n_in)).astype(np.int64)
    rank_e = np.arange(cap) + np.minimum(col_q, n_in) + 1
    rank_m = np.concatenate([rank_x, rank_e])
    rank_m_full = np.concatenate([rank_m, np.arange(n_in + cap, L)]).astype(np.int32)
    barrier_m = np.zeros(L, np.int32)
    barrier_m[rank_x] = 1
    barrier_m[n_in + cap:] = 1
    merged_slot_of_d = np.empty(cap, np.int64)
    merged_slot_of_d[q_order] = rank_e
    rank_vals = np.empty(L, np.int64)
    rank_vals[:cap] = merged_slot_of_d
    rank_vals[cap:] = np.setdiff1d(np.arange(L), merged_slot_of_d)
    indptr_row = np.searchsorted(np.minimum(rows, n_out), np.arange(n_out + 1))
    ident_pos = indptr_row[:-1] + np.arange(n_out)
    inter_of_d = np.arange(cap) + np.minimum(rows, n_out) + 1
    rank_back = np.empty(L, np.int64)
    rank_back[merged_slot_of_d] = inter_of_d
    taken = np.zeros(L, bool)
    taken[inter_of_d] = True
    src_free = np.ones(L, bool)
    src_free[merged_slot_of_d] = False
    rank_back[src_free] = np.nonzero(~taken)[0]
    barrier_i = np.zeros(L, np.int32)
    barrier_i[ident_pos] = 1
    barrier_i[n_out + cap:] = 1
    is_ident = np.zeros(L, bool)
    is_ident[ident_pos] = True
    is_ident[n_out + cap:] = True
    last_pos = indptr_row[1:] + np.arange(n_out)
    ext_rank = np.empty(L, np.int64)
    ext_rank[last_pos] = np.arange(n_out)
    others = np.ones(L, bool)
    others[last_pos] = False
    ext_rank[others] = n_out + np.arange(L - n_out)
    dev = lambda a: jnp.asarray(np.asarray(a, np.int32))  # noqa: E731
    return {
        "rank_m": dev(rank_m_full), "barrier_m": dev(barrier_m),
        "rank_vals": dev(rank_vals), "rank_back": dev(rank_back),
        "barrier_i": dev(barrier_i), "is_ident": jnp.asarray(is_ident),
        "ext_rank": dev(ext_rank),
    }, L


def spmv(plan, n_in, n_out, vals_m, ok_m, x, x_valid):
    L = plan["rank_m"].shape[0]
    first = lambda a, b: a  # noqa: E731
    plus = lambda a, b: a + b  # noqa: E731
    pay_v = jnp.concatenate([x, jnp.zeros(L - n_in, x.dtype)])
    pay_h = jnp.concatenate([x_valid.astype(jnp.int32),
                             jnp.zeros(L - n_in, jnp.int32)])
    m_v = sort_apply(plan["rank_m"], pay_v)
    m_h = sort_apply(plan["rank_m"], pay_h)
    f_v, f_h = segscan_call(plan["barrier_m"], [m_v, m_h], [first, first])
    ok = (f_h != 0) & ok_m & (plan["barrier_m"] == 0)
    prods = jnp.where(ok, f_v * vals_m, 0.0)
    okc = ok.astype(jnp.int32)
    i_v = sort_apply(plan["rank_back"], prods)
    i_h = sort_apply(plan["rank_back"], okc)
    i_v = jnp.where(plan["is_ident"], 0.0, i_v)
    i_h = jnp.where(plan["is_ident"], 0, i_h)
    s_v, s_h = segscan_call(plan["barrier_i"], [i_v, i_h], [plus, plus])
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
    rows = (lin // n).astype(np.int64)
    cols = (lin % n).astype(np.int64)
    E = len(rows)
    cap = _bucket(E)
    rows_p = np.concatenate([rows, np.full(cap - E, n, np.int64)])
    cols_p = np.concatenate([cols, np.full(cap - E, n, np.int64)])
    avals = rng.random(E).astype(np.float32)

    t0 = time.perf_counter()
    plan, L = build_plan(rows_p, cols_p, n, n, cap)
    print(f"plan build: {time.perf_counter()-t0:.2f}s  cap={cap} L={L}")

    av_p = np.zeros(L, np.float32)
    av_p[:E] = avals
    ok_p = np.zeros(L, np.int32)
    ok_p[:E] = 1
    vals_m = sort_apply(plan["rank_vals"], jnp.asarray(av_p))
    ok_m = sort_apply(plan["rank_vals"], jnp.asarray(ok_p)) != 0

    x = rng.random(n).astype(np.float32)
    xj = jnp.asarray(x)
    xval = jnp.ones(n, bool)

    import functools
    f = jax.jit(functools.partial(spmv, n_in=n, n_out=n))
    f = jax.jit(lambda plan, vm, om, x, xv: spmv(plan, n, n, vm, om, x, xv))
    t0 = time.perf_counter()
    yv, yok = f(plan, vals_m, ok_m, xj, xval)
    jax.block_until_ready((yv, yok))
    print(f"spmv compile: {time.perf_counter()-t0:.1f}s")

    oracle = np.zeros(n, np.float64)
    np.add.at(oracle, rows, avals.astype(np.float64) * x[cols])
    got = np.asarray(yv, np.float64)
    err = np.max(np.abs(got - oracle) / (np.abs(oracle) + 1e-6))
    cnt = np.zeros(n, np.int64)
    np.add.at(cnt, rows, 1)
    print(f"max rel err: {err:.2e}  ok match: "
          f"{np.array_equal(np.asarray(yok), cnt > 0)}")

    best = np.inf
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(f(plan, vals_m, ok_m, xj, xval))
        best = min(best, time.perf_counter() - t0)
    print(f"spmv: {best*1e3:.3f}ms -> {E/best/1e9:.2f} GnnZ/s (E={E})")

    def pr20(plan, vals_m, ok_m, x0):
        def body(i, cur):
            yv, _ = spmv(plan, n, n, vals_m, ok_m, cur, jnp.ones(n, bool))
            return 0.85 * yv + np.float32(0.15 / n)
        return jax.lax.fori_loop(0, 20, body, x0)

    g = jax.jit(pr20)
    t0 = time.perf_counter()
    jax.block_until_ready(g(plan, vals_m, ok_m, xj))
    print(f"pr20 compile: {time.perf_counter()-t0:.1f}s")
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(g(plan, vals_m, ok_m, xj))
        best = min(best, time.perf_counter() - t0)
    per = best / 20
    print(f"pagerank/iter: {per*1e3:.3f}ms -> {E/per/1e9:.2f} GnnZ/s")


if __name__ == "__main__":
    main()
