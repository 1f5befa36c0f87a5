import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes, monoid, select, semiring, unary
from graphblas_tpu.exceptions import (
    DimensionMismatch,
    IndexOutOfBound,
    InvalidValue,
    OutputNotEmpty,
)

from .helpers import A_COLS, A_ROWS, A_VALS, make_A, make_v


@pytest.fixture
def A():
    return make_A()


@pytest.fixture
def v():
    return make_v()


def test_new():
    C = gb.Matrix(dtypes.INT8, 17, 12)
    assert C.dtype == "INT8"
    assert C.nvals == 0
    assert C.nrows == 17
    assert C.ncols == 12


def test_from_coo(A):
    assert A.nvals == 12
    assert A.shape == (7, 7)
    r, c, vals = A.to_coo()
    order = np.lexsort((c, r))
    exp = sorted(zip(A_ROWS, A_COLS, A_VALS))
    got = sorted(zip(r.tolist(), c.tolist(), vals.tolist()))
    assert [(int(a), int(b), int(cc)) for a, b, cc in exp] == got


def test_from_edgelist():
    M = gb.Matrix.from_edgelist([(0, 1), (1, 2)], values=5)
    assert M.nvals == 2
    assert M[0, 1].new().value == 5
    M2 = gb.Matrix.from_edgelist([(0, 1, 2.0), (1, 2, 3.0)])
    assert M2[1, 2].new().value == 3.0


def test_csr_roundtrip(A):
    indptr, cols, vals = A.to_csr()
    B = gb.Matrix.from_csr(indptr, cols, vals, ncols=7)
    assert B.isequal(A)
    indptr, rows, vals = A.to_csc()
    C = gb.Matrix.from_csc(indptr, rows, vals, nrows=7)
    assert C.isequal(A)
    cr, ip, cc, vv = A.to_dcsr()
    D = gb.Matrix.from_dcsr(cr, ip, cc, vv, nrows=7, ncols=7)
    assert D.isequal(A)
    cc2, ip2, rr2, vv2 = A.to_dcsc()
    E = gb.Matrix.from_dcsc(cc2, ip2, rr2, vv2, nrows=7, ncols=7)
    assert E.isequal(A)


def test_from_dense_scalar():
    M = gb.Matrix.from_dense([[1, 0], [0, 2]], missing_value=0)
    assert M.nvals == 2
    N = gb.Matrix.from_scalar(3, 2, 2)
    assert N.nvals == 4
    assert N.to_dense().tolist() == [[3, 3], [3, 3]]


def test_from_to_dicts(A):
    d = A.to_dicts()
    assert d[0] == {1: 2, 3: 3}
    B = gb.Matrix.from_dicts(d, nrows=7, ncols=7)
    assert B.isequal(A)
    dc = A.to_dicts(order="columnwise")
    assert dc[0] == {3: 3}
    C = gb.Matrix.from_dicts(dc, order="columnwise", nrows=7, ncols=7)
    assert C.isequal(A)


def test_build_dup_op():
    M = gb.Matrix(dtypes.INT64, 2, 2)
    M.build([0, 0], [1, 1], [5, 7], dup_op=binary.max)
    assert M[0, 1].new().value == 7


def test_mxm(A):
    C = A.mxm(A, semiring.plus_times).new()
    # row 0 of A: (1,2),(3,3); row 1: (4,8),(6,4); C[0,j] = 2*A[1,j] + 3*A[3,j]
    assert C[0, 4].new().value == 2 * 8
    assert C[0, 0].new().value == 3 * 3
    assert C[0, 2].new().value == 3 * 3
    assert C[0, 6].new().value == 2 * 4
    # structural count matches the dense-numpy oracle
    ok = make_A().to_dense(0) != 0
    assert C.nvals == int(((ok.astype(int) @ ok.astype(int)) > 0).sum())


def test_mxm_masked(A):
    # C<A.S> = A plus_pair A (triangle-count style)
    C = gb.Matrix(dtypes.INT64, 7, 7)
    C(A.S) << A.mxm(A, semiring.plus_pair)
    assert C.nvals <= A.nvals
    for (i, j) in zip(*C.to_coo()[:2]):
        assert A[int(i), int(j)].new().value is not None


def test_mxm_transposed(A):
    C1 = A.T.mxm(A, semiring.plus_times).new()
    dense = A.to_dense(0)
    expected = dense.T @ dense
    got = C1.to_dense(0)
    np.testing.assert_array_equal(got, expected)
    C2 = A.mxm(A.T, semiring.plus_times).new()
    np.testing.assert_array_equal(C2.to_dense(0), dense @ dense.T)


def test_mxv(A, v):
    w = A.mxv(v, semiring.plus_times).new()
    assert w.to_dict() == {0: 5, 1: 16, 6: 13}
    w2 = A.mxv(v, semiring.min_plus).new()
    assert w2.to_dict() == {0: 3, 1: 4, 6: 5}


def test_kronecker():
    A = gb.Matrix.from_coo([0, 1], [1, 0], [2, 3])
    B = gb.Matrix.from_coo([0, 0], [0, 1], [10, 20], nrows=2, ncols=2)
    K = A.kronecker(B, binary.times).new()
    assert K.shape == (4, 4)
    assert K[0, 2].new().value == 20
    assert K.to_dicts() == {0: {2: 20, 3: 40}, 2: {0: 30, 1: 60}}


def test_reduce_rowwise_columnwise(A):
    r = A.reduce_rowwise(monoid.plus).new()
    assert r.to_dict() == {0: 5, 1: 12, 2: 1, 3: 6, 4: 7, 5: 1, 6: 15}
    c = A.reduce_columnwise(monoid.plus).new()
    assert c.to_dict() == {0: 3, 1: 2, 2: 9, 3: 10, 4: 11, 5: 8, 6: 4}
    assert A.reduce_scalar(monoid.plus).new().value == 47
    # transposed
    rt = A.T.reduce_rowwise(monoid.plus).new()
    assert rt.isequal(c)


def test_reduce_agg(A):
    r = A.reduce_rowwise(gb.agg.count).new()
    assert r.to_dict() == {0: 2, 1: 2, 2: 1, 3: 2, 4: 1, 5: 1, 6: 3}
    s = A.reduce_scalar(gb.agg.mean).new()
    assert abs(s.value - 47 / 12) < 1e-12


def test_apply_select(A):
    B = A.apply(unary.one).new()
    assert set(B.to_coo()[2].tolist()) == {1}
    T = A.select(select.tril).new()
    for i, j in zip(*T.to_coo()[:2]):
        assert j <= i
    U = A.select("triu", 1).new()
    for i, j in zip(*U.to_coo()[:2]):
        assert j >= i + 1


def test_extract(A):
    B = A[[0, 3, 6], [2, 3, 4]].new()
    assert B.shape == (3, 3)
    assert B.to_dicts() == {0: {1: 3}, 1: {0: 3}, 2: {0: 5, 1: 7, 2: 3}}
    row = A[6, :].new()
    assert row.to_dict() == {2: 5, 3: 7, 4: 3}
    col = A[:, 2].new()
    assert col.to_dict() == {3: 3, 5: 1, 6: 5}
    s = A[6, 3].new()
    assert s.value == 7
    # slices
    B = A[1:4, :].new()
    assert B.shape == (3, 7)
    assert B.nvals == 5


def test_extract_with_input_mask(A):
    m = gb.Matrix.from_coo([6, 6], [2, 3], [True, True], nrows=7, ncols=7)
    row = A[6, :].new(input_mask=m.S)
    assert row.to_dict() == {2: 5, 3: 7}


def test_assign(A):
    A[0, 0] = 99
    assert A[0, 0].new().value == 99
    A[1, [2, 3]] = gb.Vector.from_coo([0, 1], [55, 66], size=2)
    assert A[1, 2].new().value == 55
    B = gb.Matrix.from_coo([0, 1], [0, 1], [1, 2])
    A[[2, 3], [4, 5]] = B
    assert A[2, 4].new().value == 1
    assert A[3, 5].new().value == 2
    # region replacement deletes old entries inside region
    A2 = make_A()
    empty = gb.Matrix(dtypes.INT64, 2, 2)
    A2[[6, 5], [2, 3]] = empty
    assert A2[6, 2].new().value is None
    assert A2[6, 3].new().value is None
    assert A2.nvals == 12 - 3


def test_assign_row_col_scalar(A):
    A[4, :] = 1
    assert A[4, 0].new().value == 1
    assert A.nvals == 12 + 6
    A[:, 6] = 2
    assert A[0, 6].new().value == 2


def test_assign_masked_matrix(A):
    m = gb.Matrix.from_coo([0, 1], [0, 0], [True, True], nrows=7, ncols=7)
    A(m.S)[:, :] = 42
    assert A[0, 0].new().value == 42
    assert A[1, 0].new().value == 42
    assert A.nvals == 14
    # accum preserved old
    A2 = make_A()
    A2(accum=binary.plus)[0, 1] = 100
    assert A2[0, 1].new().value == 102


def test_del_matrix(A):
    del A[6, 3]
    assert A.nvals == 11
    del A[6, :]
    assert A.nvals == 9


def test_transpose(A):
    T = A.T
    assert T.nrows == 7 and T.ncols == 7
    assert T.nvals == 12
    TT = T.new()
    assert TT[2, 6].new().value == 5
    assert T.T is A
    C = gb.Matrix(dtypes.INT64, 7, 7)
    C << A.T
    assert C.isequal(TT)


def test_diag(A, v):
    d = A.diag()
    assert d.size == 7
    assert d.nvals == 0  # no diagonal entries in fixture
    A[2, 2] = 9
    assert A.diag().to_dict() == {2: 9}
    d1 = A.diag(1)
    assert d1.size == 6
    assert d1.to_dict() == {0: 2, 4: 7}


def test_power(A):
    C = A.power(2, semiring.plus_times).new()
    assert C.isequal(A.mxm(A, semiring.plus_times).new())
    C3 = A.power(3, semiring.plus_times).new()
    expected = A.mxm(A, semiring.plus_times).new().mxm(A, semiring.plus_times).new()
    assert C3.isequal(expected)
    with pytest.raises(ValueError):
        A.power(0)


def test_reposition(A):
    B = A.reposition(1, 1).new()
    assert B[4, 1].new().value == 3  # was A[3,0]
    assert B.nvals == 8


def test_ewise_matrix_vector_broadcast(A, v):
    # vector broadcast along rows (reference _m_mult_v semantics)
    C = A.ewise_mult(v, binary.plus).new()
    # intersection: columns where v present
    assert C[0, 1].new().value == 2 + 1
    assert C[0, 3].new().value == 3 + 1
    assert C[1, 4].new().value == 8 + 2
    assert C[3, 0].new().value is None  # v[0] missing
    D = A.ewise_add(v, binary.plus).new()
    assert D[2, 1].new().value == 1  # from broadcast v only
    assert D[3, 0].new().value == 3  # from A only


def test_isequal_isclose(A):
    B = make_A()
    assert A.isequal(B)
    B[0, 1] = 3
    assert not A.isequal(B)
    F = A.dup(dtype="FP64")
    F[0, 1] = 2.00000001
    assert not F.isequal(A.dup(dtype="FP64"))
    assert F.isclose(A.dup(dtype="FP64"))


def test_mask_on_matrix(A):
    C = gb.Matrix(dtypes.INT64, 7, 7)
    C(A.S) << gb.Matrix.from_scalar(1, 7, 7)
    assert C.nvals == 12
    C2 = gb.Matrix(dtypes.INT64, 7, 7)
    C2(~A.S) << gb.Matrix.from_scalar(1, 7, 7)
    assert C2.nvals == 49 - 12


def test_iter(A):
    items = list(A)
    assert (0, 1) in items
    assert len(items) == 12


def test_pickle(A):
    import pickle

    B = pickle.loads(pickle.dumps(A))
    assert B.isequal(A)


def test_matrix_expr_shape_errors(A):
    with pytest.raises(DimensionMismatch):
        A.mxm(gb.Matrix(dtypes.INT64, 3, 3))
    with pytest.raises(DimensionMismatch):
        A.mxv(gb.Vector(dtypes.INT64, 3))
    with pytest.raises(TypeError):
        A.mxm(A, binary.plus)


def test_matrix_scalar_infix(A):
    B = (A * 2).new()
    assert B[6, 3].new().value == 14
    C = (A + A).new()
    assert C[6, 3].new().value == 14
    D = gb.semiring.plus_times(A @ A).new()
    assert D.isequal(A.mxm(A, semiring.plus_times).new())


# --------------------------------------------------------------------- #
# Exhaustive update-semantics grid: every (mask kind x accum x replace)
# combination for each expression kind and dtype class, checked against
# the dense write-rule oracle (reference test_matrix.py's per-method case
# sweeps, SURVEY §4; write rule per SURVEY Appendix A).
from .helpers import (gb_from_pair, oracle_mask_array, oracle_update,
                      assert_pair_equal)
from .test_oracle import _oracle_ewise_add, _oracle_ewise_mult, _oracle_mxm


def _fixture_pairs(dtype):
    rng = np.random.default_rng(7)
    n = 7
    av = np.zeros((n, n), np.int64)
    ao = np.zeros((n, n), bool)
    av[A_ROWS, A_COLS] = A_VALS
    ao[A_ROWS, A_COLS] = True
    bo = rng.random((n, n)) < 0.45
    bv = rng.integers(0, 9, (n, n))
    co = rng.random((n, n)) < 0.4
    cv = rng.integers(1, 9, (n, n))
    mo = rng.random((n, n)) < 0.6
    mv = rng.integers(0, 3, (n, n))  # explicit zeros: S and V differ
    np_t = {"INT64": np.int64, "FP64": np.float64, "BOOL": np.bool_}[dtype]

    def cast(v, o):
        if np_t is np.bool_:
            return (v % 2).astype(bool) & o, o
        return np.where(o, v, 0).astype(np_t), o

    return cast(av, ao), cast(bv, bo), cast(cv, co), (mv.astype(np_t), mo)


_GRID_OPS = {
    "INT64": dict(ring="plus_times", add="plus", mult="times", un="ainv",
                  accums=["plus", "min"],
                  add_f=lambda a, b: a + b, mult_f=lambda a, b: a * b,
                  un_f=lambda a: -a, add_ident=0,
                  accum_f={"plus": lambda a, b: a + b,
                           "min": np.minimum}),
    "FP64": dict(ring="plus_times", add="plus", mult="times", un="ainv",
                 accums=["plus", "min"],
                 add_f=lambda a, b: a + b, mult_f=lambda a, b: a * b,
                 un_f=lambda a: -a, add_ident=0.0,
                 accum_f={"plus": lambda a, b: a + b,
                          "min": np.minimum}),
    "BOOL": dict(ring="lor_land", add="lor", mult="land", un="lnot",
                 accums=["lor", "land"],
                 add_f=lambda a, b: a | b, mult_f=lambda a, b: a & b,
                 un_f=lambda a: ~a, add_ident=False,
                 accum_f={"lor": lambda a, b: a | b,
                          "land": lambda a, b: a & b}),
}


def _mask_cases(M, mv, mo):
    yield "none", None, None
    for structure in (True, False):
        for complement in (False, True):
            marr = oracle_mask_array(mv, mo, structure=structure,
                                     complement=complement)
            mobj = M.S if structure else M.V
            if complement:
                mobj = ~mobj
            name = ("~" if complement else "") + ("S" if structure else "V")
            yield name, mobj, marr


@pytest.mark.parametrize("dtype", ["INT64", "FP64", "BOOL"])
@pytest.mark.parametrize(
    "exprkind", ["mxm", "mxm_at", "ewise_add", "ewise_mult", "apply",
                 "select"])
def test_update_semantics_grid(dtype, exprkind):
    if exprkind == "select" and dtype == "BOOL":
        pytest.skip("select grid covers numeric dtypes")
    ops = _GRID_OPS[dtype]
    (av, ao), (bv, bo), (cv0, co0), (mv, mo) = _fixture_pairs(dtype)
    A = gb_from_pair(av, ao)
    B = gb_from_pair(bv, bo)
    M = gb_from_pair(np.where(mo, mv, 0), mo)
    ring = getattr(gb.semiring, ops["ring"])[dtype]

    if exprkind == "mxm":
        z_vals, z_ok = _oracle_mxm(av, ao, bv, bo, ops["add_f"],
                                   ops["add_ident"], ops["mult_f"])
        mk = lambda: A.mxm(B, ring)  # noqa: E731
    elif exprkind == "mxm_at":
        z_vals, z_ok = _oracle_mxm(av.T, ao.T, bv, bo, ops["add_f"],
                                   ops["add_ident"], ops["mult_f"])
        mk = lambda: A.T.mxm(B, ring)  # noqa: E731
    elif exprkind == "ewise_add":
        z_vals, z_ok = _oracle_ewise_add(av, ao, bv, bo, ops["add_f"])
        mk = lambda: A.ewise_add(B, getattr(gb.binary, ops["add"]))  # noqa: E731
    elif exprkind == "ewise_mult":
        z_vals, z_ok = _oracle_ewise_mult(av, ao, bv, bo, ops["mult_f"])
        mk = lambda: A.ewise_mult(B, getattr(gb.binary, ops["mult"]))  # noqa: E731
    elif exprkind == "apply":
        z_vals, z_ok = ops["un_f"](av), ao
        mk = lambda: A.apply(getattr(gb.unary, ops["un"]))  # noqa: E731
    else:  # select
        keep = ao & (av > 2)
        z_vals, z_ok = np.where(keep, av, 0), keep
        mk = lambda: A.select(gb.select.valuegt, 2)  # noqa: E731
    z_vals = np.where(z_ok, z_vals, 0)

    isfloat = dtype == "FP64"
    for mname, mobj, marr in _mask_cases(M, mv, mo):
        for accum_name in [None] + ops["accums"]:
            for replace in (False, True):
                if mobj is None and replace:
                    continue  # replace requires a mask (matches reference)
                C = gb_from_pair(cv0, co0)
                accum = (None if accum_name is None
                         else getattr(gb.binary, accum_name))
                if mobj is None and accum is None:
                    C << mk()
                else:
                    C(mask=mobj, accum=accum, replace=replace) << mk()
                accum_f = (None if accum_name is None
                           else ops["accum_f"][accum_name])
                exp_v, exp_ok = oracle_update(
                    cv0, co0, z_vals, z_ok, marr, accum=accum_f,
                    replace=replace)
                try:
                    assert_pair_equal(C, exp_v, exp_ok, isfloat=isfloat)
                except AssertionError as e:
                    raise AssertionError(
                        f"{exprkind} {dtype} mask={mname} "
                        f"accum={accum_name} replace={replace}: {e}"
                    ) from None
