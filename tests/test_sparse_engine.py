"""Sparse-engine parity: every scale-path kernel (merge ewise, SpGEMM,
extract/assign, masked/accum write-back) must agree with the dense bitmap
engine on the same inputs — the dual-backend testing strategy of SURVEY §4
(vanilla vs suitesparse), played here by dense vs sparse backings.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, monoid, semiring


N = 37


@pytest.fixture
def graphs():
    rng = np.random.default_rng(7)

    def rand_coo(density):
        m = rng.random((N, N)) < density
        r, c = np.nonzero(m)
        v = rng.integers(1, 9, len(r)).astype(np.float64)
        return r, c, v

    return rand_coo(0.15), rand_coo(0.2)


def _as_dense(M, shape):
    r, c, v = M.to_coo()
    out = np.zeros(shape)
    out[r.astype(int), c.astype(int)] = v
    return out


def run_both(graphs, scenario):
    """Run a scenario with sparse-backed and dense-backed operands."""
    (ra, ca, va), (rb, cb, vb) = graphs
    results = []
    for limit in (16, 1 << 40):  # force sparse / force dense
        old = gb.config.get("auto_sparse_limit")
        gb.config["auto_sparse_limit"] = limit
        try:
            A = gb.Matrix.from_coo(ra, ca, va, nrows=N, ncols=N)
            B = gb.Matrix.from_coo(rb, cb, vb, nrows=N, ncols=N)
            if limit == 16:
                assert A._sparse is not None, "sparse backing expected"
            out = scenario(A, B)
            results.append(_as_dense(out, out.shape) if isinstance(
                out, gb.Matrix) else np.asarray(out))
        finally:
            gb.config["auto_sparse_limit"] = old
    sparse_res, dense_res = results
    np.testing.assert_allclose(sparse_res, dense_res, rtol=1e-12)
    return sparse_res


def test_merge_ewise_add(graphs):
    run_both(graphs, lambda A, B: A.ewise_add(B, binary.plus).new())


def test_merge_ewise_mult(graphs):
    run_both(graphs, lambda A, B: A.ewise_mult(B, binary.times).new())


def test_merge_ewise_union(graphs):
    run_both(graphs, lambda A, B: A.ewise_union(
        B, binary.minus, left_default=100, right_default=-100).new())


def test_merge_ewise_with_transpose(graphs):
    run_both(graphs, lambda A, B: A.T.ewise_add(B, binary.max).new())


def test_spgemm_plain(graphs):
    run_both(graphs, lambda A, B: A.mxm(B, semiring.plus_times).new())


def test_spgemm_transposes(graphs):
    run_both(graphs, lambda A, B: A.T.mxm(B, semiring.plus_times).new())
    run_both(graphs, lambda A, B: A.mxm(B.T, semiring.min_plus).new())
    run_both(graphs, lambda A, B: A.T.mxm(B.T, semiring.max_times).new())


def test_spgemm_masked(graphs):
    run_both(graphs, lambda A, B: A.mxm(B, semiring.plus_times).new(mask=A.S))
    run_both(graphs, lambda A, B: A.mxm(B, semiring.plus_times).new(mask=~A.S))


def test_spgemm_masked_accum_writeback(graphs):
    def scenario(A, B):
        C = A.dup()
        C(mask=B.S, accum=binary.plus) << A.mxm(B, semiring.plus_times)
        return C

    run_both(graphs, scenario)


def test_writeback_replace(graphs):
    def scenario(A, B):
        C = A.dup()
        C(mask=B.V, replace=True) << A.ewise_add(B, binary.plus)
        return C

    run_both(graphs, scenario)


def test_extract_submatrix(graphs):
    run_both(graphs, lambda A, B: A[0:20, 5:25].new())
    run_both(graphs, lambda A, B: A[::2, ::3].new())


def test_extract_row_col(graphs):
    def scenario(A, B):
        w = A[3, :].new()
        u = A[:, 4].new()
        out = np.zeros((2, N))
        iw, vw = w.to_coo()
        iu, vu = u.to_coo()
        out[0, iw.astype(int)] = vw
        out[1, iu.astype(int)] = vu
        return out

    run_both(graphs, scenario)


def test_assign_submatrix(graphs):
    def scenario(A, B):
        C = A.dup()
        V = B[0:10, 0:10].new()
        C[5:15, 5:15] = V
        return C

    run_both(graphs, scenario)


def test_assign_scalar_region(graphs):
    def scenario(A, B):
        C = A.dup()
        C[0:8, 0:8] = 42
        return C

    run_both(graphs, scenario)


def test_assign_masked_accum(graphs):
    def scenario(A, B):
        C = A.dup()
        V = B[0:15, 0:15].new()
        C(mask=B.S, accum=binary.plus)[0:15, 0:15] = V
        return C

    run_both(graphs, scenario)


def test_assign_element_and_delete(graphs):
    (ra, ca, va), _ = graphs

    def scenario2(A, B):
        C = A.dup()
        C[2, 3] = 99.0
        del C[int(ra[0]), int(ca[0])]
        return C

    run_both(graphs, scenario2)


def test_triangle_count_graph_scale():
    """Masked SpGEMM at graph scale: never densifies (VERDICT missing #1)."""
    rng = np.random.default_rng(3)
    n = 20000
    nedges = 120000
    r = rng.integers(0, n, nedges)
    c = rng.integers(0, n, nedges)
    keep = r > c  # strictly lower triangular
    r, c = r[keep], c[keep]
    L = gb.Matrix.from_coo(r, c, np.ones(len(r)), nrows=n, ncols=n,
                           dup_op=binary.first)
    assert L._sparse is not None
    C = L.mxm(L.T, semiring.plus_pair["FP64"]).new(mask=L.S)
    tri = C.reduce_scalar(monoid.plus).new().value
    # oracle via scipy
    import scipy.sparse as sp

    S = sp.coo_matrix((np.ones(len(r)), (r, c)), shape=(n, n)).tocsr()
    S.sum_duplicates()
    S.data[:] = 1.0
    P = (S @ S.T).multiply(S)
    assert tri == pytest.approx(P.sum())
