"""Debug the sort-based SpMV pipeline at small scale on CPU (numpy oracle)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np

import jax
import jax.numpy as jnp

np.random.seed(0)


def sort_apply(ranks, vals):
    return jax.lax.sort((ranks, vals), num_keys=1)[1]


def segscan_np(barrier, vals, combines):
    """Reference segmented scan (numpy, sequential)."""
    outs = [v.copy() for v in [np.asarray(v) for v in vals]]
    for i in range(1, len(barrier)):
        if not barrier[i]:
            for o, c in zip(outs, combines):
                o[i] = c(o[i - 1], o[i])
    return [jnp.asarray(o) for o in outs]


def _bucket(n, lo=8):
    cap = lo
    while cap < n:
        cap <<= 1
    return cap


def build_plan(rows, cols, n_out, n_in, cap):
    """rows/cols: (cap,) int64, (row,col)-sorted, sentinels row=n_out,col=n_in."""
    L = _bucket(max(n_in, n_out) + cap)

    q_order = np.lexsort((rows, cols))          # contraction-major edge order
    col_q = cols[q_order]
    indptr_col = np.searchsorted(col_q, np.arange(n_in + 1))
    # merged order: for each col c: [x_c, edges with col=c...]; pads at tail
    rank_x = (indptr_col[:-1] + np.arange(n_in)).astype(np.int64)
    rank_e = np.arange(cap) + np.minimum(col_q, n_in) + 1
    # sentinel-padded edges: col_q == n_in -> they land after all x slots: ok
    rank_m = np.concatenate([rank_x, rank_e])
    assert len(np.unique(rank_m)) == len(rank_m), "rank_m not a permutation"
    rank_m_full = np.concatenate(
        [rank_m, np.arange(n_in + cap, L)]).astype(np.int32)

    barrier_m = np.zeros(L, np.int32)
    barrier_m[rank_x] = 1
    barrier_m[n_in + cap:] = 1

    # store(d)-order -> merged slot of that edge
    # edge q (contraction order) = store position q_order[q]; merged slot rank_e[q]
    merged_slot_of_d = np.empty(cap, np.int64)
    merged_slot_of_d[q_order] = rank_e
    # one-sort pre-permutation for A values: vals_m[merged_slot_of_d[d]] = vals[d]
    rank_vals = np.empty(L, np.int32)
    rank_vals[:cap] = merged_slot_of_d
    free = np.setdiff1d(np.arange(L), merged_slot_of_d)
    rank_vals[cap:] = free

    # interleaved dest layout: for each row r: [ident_r, edges of r...]
    indptr_row = np.searchsorted(np.minimum(rows, n_out), np.arange(n_out + 1))
    ident_pos = indptr_row[:-1] + np.arange(n_out)
    inter_of_d = np.arange(cap) + np.minimum(rows, n_out) + 1  # d -> slot

    rank_back = np.empty(L, np.int64)
    rank_back[merged_slot_of_d] = inter_of_d
    taken = np.zeros(L, bool)
    taken[inter_of_d] = True
    src_free = np.ones(L, bool)
    src_free[merged_slot_of_d] = False
    rank_back[src_free] = np.nonzero(~taken)[0]
    assert len(np.unique(rank_back)) == L

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
        "L": L, "cap": cap, "n_in": n_in, "n_out": n_out,
        "rank_m": dev(rank_m_full), "barrier_m": dev(barrier_m),
        "rank_vals": dev(rank_vals),
        "rank_back": dev(rank_back), "barrier_i": dev(barrier_i),
        "is_ident": jnp.asarray(is_ident), "ext_rank": dev(ext_rank),
    }


def spmv(plan, vals_m, edge_ok_m, x, x_valid):
    L, n_in, n_out = plan["L"], plan["n_in"], plan["n_out"]
    first = lambda a, b: a  # noqa: E731
    pay_v = jnp.concatenate([x, jnp.zeros(L - n_in, x.dtype)])
    pay_h = jnp.concatenate([x_valid.astype(jnp.int32),
                             jnp.zeros(L - n_in, jnp.int32)])
    m_v = sort_apply(plan["rank_m"], pay_v)
    m_h = sort_apply(plan["rank_m"], pay_h)
    f_v, f_h = segscan_np(np.asarray(plan["barrier_m"]), [m_v, m_h],
                          [first, first])
    prods = f_v * vals_m
    ok = (f_h != 0) & edge_ok_m & (jnp.asarray(plan["barrier_m"]) == 0)
    prods = jnp.where(ok, prods, 0.0)
    okc = ok.astype(jnp.int32)
    i_v = sort_apply(plan["rank_back"], prods)
    i_h = sort_apply(plan["rank_back"], okc)
    i_v = jnp.where(plan["is_ident"], 0.0, i_v)
    i_h = jnp.where(plan["is_ident"], 0, i_h)
    s_v, s_h = segscan_np(np.asarray(plan["barrier_i"]), [i_v, i_h],
                          [lambda a, b: a + b, lambda a, b: a + b])
    e_v = sort_apply(plan["ext_rank"], s_v)[:n_out]
    e_h = sort_apply(plan["ext_rank"], s_h)[:n_out]
    return e_v, e_h > 0


def test_once(n_out, n_in, E, seed, x_density=1.0):
    rng = np.random.default_rng(seed)
    lin = rng.choice(n_out * n_in, min(E, n_out * n_in), replace=False)
    lin.sort()
    rows = (lin // n_in).astype(np.int64)
    cols = (lin % n_in).astype(np.int64)
    E = len(rows)
    cap = _bucket(E)
    rows_p = np.concatenate([rows, np.full(cap - E, n_out, np.int64)])
    cols_p = np.concatenate([cols, np.full(cap - E, n_in, np.int64)])
    avals = rng.random(E).astype(np.float32)
    plan = build_plan(rows_p, cols_p, n_out, n_in, cap)
    L = plan["L"]
    av_p = np.zeros(L, np.float32)
    av_p[:E] = avals
    ok_p = np.zeros(L, bool)
    ok_p[:E] = True
    vals_m = sort_apply(plan["rank_vals"], jnp.asarray(av_p))
    ok_m = sort_apply(plan["rank_vals"], jnp.asarray(ok_p.astype(np.int32))) != 0

    x = rng.random(n_in).astype(np.float32)
    xv = rng.random(n_in) < x_density
    yv, yok = spmv(plan, vals_m, ok_m, jnp.asarray(x), jnp.asarray(xv))

    oracle = np.zeros(n_out, np.float64)
    ocnt = np.zeros(n_out, np.int64)
    for r, c, v in zip(rows, cols, avals):
        if xv[c]:
            oracle[r] += float(v) * float(x[c])
            ocnt[r] += 1
    ok_ref = ocnt > 0
    got = np.asarray(yv, np.float64)
    err = np.max(np.abs(np.where(ok_ref, got - oracle, 0.0)))
    okm = np.array_equal(np.asarray(yok), ok_ref)
    status = "PASS" if (err < 1e-4 and okm) else "FAIL"
    print(f"{status} n_out={n_out} n_in={n_in} E={E} dens={x_density}: "
          f"err={err:.2e} ok={okm}")
    return status == "PASS"


if __name__ == "__main__":
    allp = True
    for args in [(8, 8, 12, 1), (16, 8, 20, 2), (8, 16, 30, 3),
                 (50, 40, 200, 4), (100, 100, 500, 5),
                 (100, 100, 500, 6, 0.5), (1000, 1000, 5000, 7, 0.7),
                 (1, 1000, 500, 8), (1000, 1, 800, 9)]:
        allp &= test_once(*args)
    print("ALL PASS" if allp else "FAILURES")
