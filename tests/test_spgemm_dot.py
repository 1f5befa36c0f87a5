"""Mask-bounded SpGEMM (dot formulation) tests — VERDICT r2 #4.

For a non-complemented sparse mask, ``C(M) << A @ B`` must be bounded by
the mask (sum over M of min(deg_A, deg_B) expansion; output capacity == the
mask's), not by the unmasked Gustavson product count sum(deg^2), which
explodes on power-law graphs.  Reference semantics: matrix.py:2206
(GrB_mxm with mask); SuiteSparse's masked dot kernel is the analog
(core/ss/descriptor.py:74-80 axb_method="dot").
"""

import time

import numpy as np
import pytest
import scipy.sparse as ssp

import graphblas_tpu as gb


def _oracle_masked_mxm(r, c, v, mr, mc, m_keep, n, semiring_np):
    """Masked product oracle via scipy; only for sizes where sum(deg^2) is
    tractable.  Returns dict {(i, j): value} for mask-kept product entries
    (structure = dot products with >= 1 term)."""
    plus, times = semiring_np
    S = ssp.coo_matrix((v.astype(np.float64), (r, c)), shape=(n, n)).tocsr()
    Sb = ssp.coo_matrix((np.ones(len(r)), (r, c)), shape=(n, n)).tocsr()
    P = (S @ S).tocoo()
    Pn = (Sb @ Sb).tocoo()
    mok = np.zeros((n, n), bool)
    mok[mr, mc] = m_keep
    exp = {}
    for i, j in zip(Pn.row, Pn.col):
        if mok[i, j]:
            exp[(i, j)] = 0.0
    for i, j, val in zip(P.row, P.col, P.data):
        if (i, j) in exp:
            exp[(i, j)] = val
    return exp


def _rand_graph(rng, n, nnz):
    lin = np.sort(rng.choice(n * n, nnz, replace=False))
    return lin // n, lin % n


@pytest.mark.parametrize("structure", [True, False])
def test_masked_dot_parity_scipy(rng, structure):
    n = 400
    r, c = _rand_graph(rng, n, 3000)
    v = rng.random(len(r)).astype(np.float32)
    mr, mc = _rand_graph(rng, n, 2500)
    mv = rng.integers(0, 2, len(mr)).astype(bool)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, v, dtype="FP32", nrows=n, ncols=n)
        M = gb.Matrix.from_coo(mr, mc, mv, dtype="BOOL", nrows=n, ncols=n)
    mask = M.S if structure else M.V
    # axb_method="dot" forces the dot formulation regardless of the bound
    got_m = A.mxm(A, gb.semiring.plus_times).new(mask=mask, axb_method="dot")
    keep = np.ones(len(mr), bool) if structure else mv
    exp = _oracle_masked_mxm(r, c, v, mr, mc, keep, n,
                             (np.add, np.multiply))
    gr, gc, gv = got_m.to_coo()
    got = dict(zip(zip(gr.tolist(), gc.tolist()), gv.tolist()))
    assert set(got) == set(exp)
    for k in exp:
        assert abs(got[k] - exp[k]) <= 1e-3 * max(1.0, abs(exp[k]))


def test_masked_dot_matches_gustavson(rng):
    """dot and gustavson formulations agree bit-for-bit on integer data."""
    n = 300
    r, c = _rand_graph(rng, n, 2500)
    v = rng.integers(1, 50, len(r))
    mr, mc = _rand_graph(rng, n, 2000)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, v, dtype="INT64", nrows=n, ncols=n)
        B = gb.Matrix.from_coo(c, r, v, dtype="INT64", nrows=n, ncols=n)
        M = gb.Matrix.from_coo(mr, mc, np.ones(len(mr), bool),
                               nrows=n, ncols=n)
    for ring in (gb.semiring.plus_times, gb.semiring.min_plus,
                 gb.semiring.plus_pair, gb.semiring.max_first):
        d = A.mxm(B, ring).new(mask=M.S, axb_method="dot")
        g = A.mxm(B, ring).new(mask=M.S, axb_method="gustavson")
        assert d.isequal(g), ring.name


def test_masked_dot_transposes(rng):
    n = 250
    r, c = _rand_graph(rng, n, 2000)
    v = rng.integers(1, 9, len(r))
    mr, mc = _rand_graph(rng, n, 1500)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, v, dtype="INT64", nrows=n, ncols=n)
        M = gb.Matrix.from_coo(mr, mc, np.ones(len(mr), bool),
                               nrows=n, ncols=n)
    for expr in (A.T.mxm(A, gb.semiring.plus_times),
                 A.mxm(A.T, gb.semiring.plus_times),
                 A.T.mxm(A.T, gb.semiring.plus_times)):
        d = expr.new(mask=M.S, axb_method="dot")
        g = expr.new(mask=M.S, axb_method="gustavson")
        assert d.isequal(g)


def test_powerlaw_triangle_count():
    """The VERDICT r2 #4 acceptance case: zipf-degree graph, >=500k edges.

    The unmasked Gustavson bound sum(deg^2) is ~1e10 here (hub column);
    the masked dot path must run in seconds with capacity bounded by the
    mask.  Correctness is pinned by the same computation at a scipy-
    tractable size in test_masked_dot_parity_scipy; here we pin scale,
    the capacity bound, and L-vs-U self-consistency."""
    rng = np.random.default_rng(11)
    n = 1 << 17
    nnz = 700_000
    src = rng.integers(0, n, nnz)
    dst = (rng.zipf(1.5, nnz) - 1) % n
    # symmetrize, drop loops, dedupe
    rr = np.concatenate([src, dst])
    cc = np.concatenate([dst, src])
    keep = rr != cc
    lin = np.unique(rr[keep].astype(np.int64) * n + cc[keep])
    rr, cc = lin // n, lin % n
    assert len(rr) >= 500_000
    low = rr > cc
    lr, lc = rr[low], cc[low]

    deg = np.bincount(rr, minlength=n).astype(np.int64)
    assert (deg**2).sum() > 2_000_000_000  # gustavson bound explodes

    with gb.config.set(auto_sparse_limit=0):
        L = gb.Matrix.from_coo(lr, lc, np.ones(len(lr), np.int64),
                               nrows=n, ncols=n)
        U = gb.Matrix.from_coo(lc, lr, np.ones(len(lr), np.int64),
                               nrows=n, ncols=n)
    t0 = time.perf_counter()
    C = L.mxm(L.T, gb.semiring.plus_pair).new(mask=L.S)
    tri_l = int(C.reduce_scalar(gb.monoid.plus).new().value)
    elapsed = time.perf_counter() - t0
    # capacity is bounded by the mask, not the product count
    assert C._sparse is not None
    # small multiple of the mask capacity (write-back unions in the empty
    # target's minimum bucket), never the sum(deg^2) product bound
    assert C._sparse.cap <= 2 * L._sparse.cap
    # same count from the upper-triangular formulation
    C2 = U.mxm(U.T, gb.semiring.plus_pair).new(mask=U.S)
    tri_u = int(C2.reduce_scalar(gb.monoid.plus).new().value)
    assert tri_l == tri_u
    assert tri_l > 0
    assert elapsed < 120, f"masked triangle count took {elapsed:.0f}s"
