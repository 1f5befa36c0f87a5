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

from .helpers import make_A, make_v, to_dense_pair


@pytest.fixture
def A():
    return make_A()


@pytest.fixture
def v():
    return make_v()


def test_new():
    u = gb.Vector(dtypes.INT8, 17)
    assert u.dtype == "INT8"
    assert u.nvals == 0
    assert u.size == 17
    assert u.shape == (17,)


def test_from_coo_infer_size():
    u = gb.Vector.from_coo([0, 5], [1.5, 2.5])
    assert u.size == 6
    assert u.dtype == dtypes.FP64
    with pytest.raises(ValueError, match="No indices"):
        gb.Vector.from_coo([], [])
    u = gb.Vector.from_coo([], [], size=10)
    assert u.size == 10
    assert u.nvals == 0


def test_from_coo_iso():
    u = gb.Vector.from_coo([1, 3], 7, size=5)
    assert u.to_coo()[1].tolist() == [7, 7]


def test_from_pairs():
    u = gb.Vector.from_pairs([(1, 10), (3, 30)])
    assert u.size == 4
    assert u.to_coo()[1].tolist() == [10, 30]


def test_from_scalar_and_dense():
    u = gb.Vector.from_scalar(5, 4)
    assert u.nvals == 4
    assert u.to_dense().tolist() == [5, 5, 5, 5]
    w = gb.Vector.from_dense([1, 0, 2], missing_value=0)
    assert w.nvals == 2
    assert w.to_coo()[0].tolist() == [0, 2]


def test_from_to_dict(v):
    d = v.to_dict()
    assert d == {1: 1, 3: 1, 4: 2, 6: 0}
    u = gb.Vector.from_dict(d, size=7)
    assert u.isequal(v)


def test_build_errors(v):
    with pytest.raises(OutputNotEmpty):
        v.build([0], [1])
    u = gb.Vector(dtypes.INT64, 5)
    with pytest.raises(IndexOutOfBound):
        u.build([7], [1])
    with pytest.raises(InvalidValue, match="duplicate"):
        u.build([1, 1], [1, 2])
    u.build([1, 1], [1, 2], dup_op=binary.plus)
    assert u[1].new().value == 3


def test_dup(v):
    w = v.dup()
    assert w is not v
    assert w.isequal(v)
    v[0] = 100
    assert not w.isequal(v)
    f = v.dup(dtype=dtypes.FP64)
    assert f.dtype == dtypes.FP64
    c = v.dup(clear=True)
    assert c.nvals == 0
    u = make_v()
    masked = u.dup(mask=u.V)  # value mask: drops the 0 at index 6
    assert masked.nvals == 3
    assert 6 not in masked


def test_clear_resize(v):
    v.resize(10)
    assert v.size == 10
    assert v.nvals == 4
    v.resize(3)
    assert v.size == 3
    assert v.nvals == 1
    v.clear()
    assert v.nvals == 0


def test_ewise_add(v):
    w = gb.Vector.from_coo([0, 1, 6], [10, 20, 30], size=7)
    r = v.ewise_add(w, binary.plus).new()
    assert r.to_dict() == {0: 10, 1: 21, 3: 1, 4: 2, 6: 30}
    # default op is plus
    r2 = v.ewise_add(w).new()
    assert r2.isequal(r)
    # monoid allowed
    r3 = v.ewise_add(w, monoid.max).new()
    assert r3.to_dict() == {0: 10, 1: 20, 3: 1, 4: 2, 6: 30}


def test_ewise_mult(v):
    w = gb.Vector.from_coo([0, 1, 6], [10, 20, 30], size=7)
    r = v.ewise_mult(w, binary.times).new()
    assert r.to_dict() == {1: 20, 6: 0}
    r = v.ewise_mult(w, binary.second).new()
    assert r.to_dict() == {1: 20, 6: 30}


def test_ewise_union(v):
    w = gb.Vector.from_coo([0, 1], [10, 20], size=7)
    r = v.ewise_union(w, binary.minus, 0, 0).new()
    assert r.to_dict() == {0: -10, 1: -19, 3: 1, 4: 2, 6: 0}


def test_ewise_dimension_mismatch(v):
    w = gb.Vector(dtypes.INT64, 3)
    with pytest.raises(DimensionMismatch):
        v.ewise_add(w)


def test_vxm(v, A):
    w = v.vxm(A, semiring.min_plus).new()
    assert w.to_dict() == {0: 4, 2: 4, 3: 7, 4: 3, 5: 9, 6: 5}
    w2 = v.vxm(A, semiring.plus_times).new()
    # v=[.,1,.,1,2,.,0]; col j: sum over i v[i]*A[i,j]
    assert w2.to_dict() == {0: 3, 2: 3, 3: 0, 4: 8, 5: 14, 6: 4}


def test_vxm_transposed(v, A):
    w = v.vxm(A.T, semiring.plus_times).new()
    # w[i] = sum over stored j of v[j] * A[i,j]
    assert w.to_dict() == {0: 5, 1: 16, 6: 13}


def test_inner_outer(v):
    w = gb.Vector.from_coo([1, 4], [3, 5], size=7)
    s = v.inner(w, semiring.plus_times).new()
    assert s.value == 1 * 3 + 2 * 5
    M = v.outer(w, binary.times).new()
    assert M.shape == (7, 7)
    assert M.nvals == 8
    assert M[4, 4].new().value == 10


def test_apply(v):
    r = v.apply(unary.ainv).new()
    assert r.to_dict() == {1: -1, 3: -1, 4: -2, 6: 0}
    r = v.apply(binary.plus, right=10).new()
    assert r.to_dict() == {1: 11, 3: 11, 4: 12, 6: 10}
    r = v.apply(binary.minus, left=10).new()
    assert r.to_dict() == {1: 9, 3: 9, 4: 8, 6: 10}
    r = v.apply(gb.indexunary.rowindex).new()
    assert r.to_dict() == {1: 1, 3: 3, 4: 4, 6: 6}


def test_select(v):
    r = v.select(select.valuegt, 0).new()
    assert r.to_dict() == {1: 1, 3: 1, 4: 2}
    r = v.select("<=", 1).new()
    assert r.to_dict() == {1: 1, 3: 1, 6: 0}
    r = v.select(select.rowle, 3).new()
    assert r.to_dict() == {1: 1, 3: 1}
    r = gb.select.value(v > 1).new()
    assert r.to_dict() == {4: 2}


def test_reduce(v):
    assert v.reduce(monoid.plus).new().value == 4
    assert v.reduce(monoid.max).new().value == 2
    assert v.reduce(monoid.min).new().value == 0
    empty = gb.Vector(dtypes.INT64, 5)
    s = empty.reduce(monoid.plus).new()
    assert s.value is None
    s = empty.reduce(monoid.plus, allow_empty=False).new()
    assert s.value == 0
    # aggregators
    assert v.reduce(gb.agg.count).new().value == 4
    assert v.reduce(gb.agg.mean).new().value == 1.0
    assert v.reduce(gb.agg.ss.argmax).new().value == 4
    assert v.reduce(gb.agg.ss.first).new().value == 1
    assert v.reduce(gb.agg.ss.last_index).new().value == 6


def test_reduce_binaryop_coerces_to_monoid(v):
    assert v.reduce(binary.plus).new().value == 4


def test_extract(v):
    r = v[[1, 3, 5]].new()
    assert r.size == 3
    assert r.to_dict() == {0: 1, 1: 1}
    r = v[1:5].new()
    assert r.to_dict() == {0: 1, 2: 1, 3: 2}
    r = v[::-1].new()
    assert r.to_dict() == {0: 0, 2: 2, 3: 1, 5: 1}
    s = v[4].new()
    assert s.value == 2
    s = v[0].new()
    assert s.value is None


def test_extract_element_get(v):
    assert v.get(4) == 2
    assert v.get(0) is None
    assert v.get(0, default=-1) == -1
    assert 4 in v
    assert 0 not in v


def test_assign_scalar(v):
    v[0] = 100
    assert v[0].new().value == 100
    v[[2, 5]] = 7
    assert v.to_dict()[2] == 7 and v.to_dict()[5] == 7
    v[:] << 9
    assert v.nvals == 7
    assert set(v.to_coo()[1].tolist()) == {9}


def test_assign_vector(v):
    w = gb.Vector.from_coo([0, 2], [50, 60], size=3)
    v[[0, 2, 5]] = w
    d = v.to_dict()
    assert d[0] == 50 and d[5] == 60
    assert 2 not in d  # region replaced; w has nothing at inner index 1
    with pytest.raises(DimensionMismatch):
        v[[0, 1]] = w


def test_assign_masked(v):
    # C(mask) << dense scalar assign (BFS pattern)
    q = gb.Vector.from_coo([1, 4], [True, True], size=7)
    v(mask=q.V)[:] = 99
    d = v.to_dict()
    assert d[1] == 99 and d[4] == 99 and d[3] == 1
    # subassign: mask shaped like the region
    u = make_v()
    m = gb.Vector.from_coo([0, 1], [True, True], size=2)
    u[[3, 4]](m.V) << gb.Vector.from_coo([0, 1], [-5, -6], size=2)
    assert u.to_dict()[3] == -5 and u.to_dict()[4] == -6


def test_assign_accum(v):
    v(accum=binary.plus)[[1, 2]] = 5
    d = v.to_dict()
    assert d[1] == 6 and d[2] == 5


def test_del(v):
    del v[1]
    assert 1 not in v
    assert v.nvals == 3
    del v[[3, 4]]
    assert v.nvals == 1


def test_update_and_mask_semantics(v):
    # C << A replaces C entirely
    w = gb.Vector.from_coo([0], [42], size=7)
    v << w
    assert v.to_dict() == {0: 42}
    # masked update without replace keeps outside-mask values
    v = make_v()
    m = gb.Vector.from_coo([1, 2], [True, True], size=7)
    src = gb.Vector.from_coo([1, 2], [70, 80], size=7)
    v(m.V) << src
    d = v.to_dict()
    assert d[1] == 70 and d[2] == 80 and d[3] == 1 and d[4] == 2 and d[6] == 0
    # with replace: outside-mask values cleared
    v = make_v()
    v(m.V, replace=True) << src
    assert v.to_dict() == {1: 70, 2: 80}
    # complemented structural mask
    v = make_v()
    v(~m.S) << gb.Vector.from_scalar(0, 7)
    d = v.to_dict()
    assert d[0] == 0 and d[1] == 1 and 2 not in d or d.get(2) == 0


def test_mask_clears_within_mask(v):
    # where mask is true and expr has no entry -> C entry deleted
    m = gb.Vector.from_scalar(True, 7)
    src = gb.Vector.from_coo([1], [9], size=7)
    v(m.V) << src
    assert v.to_dict() == {1: 9}


def test_accum_semantics(v):
    src = gb.Vector.from_coo([1, 2], [10, 20], size=7)
    v(accum=binary.plus) << src
    assert v.to_dict() == {1: 11, 2: 20, 3: 1, 4: 2, 6: 0}


def test_isequal_isclose(v):
    w = make_v()
    assert v.isequal(w)
    assert v.isequal(w, check_dtype=True)
    f = v.dup(dtype=dtypes.FP64)
    assert v.isequal(f)
    assert not v.isequal(f, check_dtype=True)
    f2 = f.dup()
    f2[1] = 1.0000000001
    assert not f.isequal(f2)
    assert f.isclose(f2)
    assert not f.isclose(f2, rel_tol=1e-12)


def test_diag(v):
    D = v.diag()
    assert D.shape == (7, 7)
    assert D[4, 4].new().value == 2
    D1 = v.diag(k=1)
    assert D1.shape == (8, 8)
    assert D1[4, 5].new().value == 2


def test_reposition(v):
    r = v.reposition(2).new()
    assert r.to_dict() == {3: 1, 5: 1, 6: 2}
    r = v.reposition(-1).new()
    assert r.to_dict() == {0: 1, 2: 1, 3: 2, 5: 0}


def test_as_matrix(v):
    m = v._as_matrix()
    assert m.shape == (7, 1)
    assert m.nvals == 4
    back = m._as_vector()
    assert back.isequal(v)


def test_iter_contains(v):
    assert list(v) == [1, 3, 4, 6]


def test_wait(v):
    assert v.wait() is v
    with pytest.raises(ValueError):
        v.wait(how="bogus")


def test_pickle_roundtrip(v):
    import pickle

    w = pickle.loads(pickle.dumps(v))
    assert w.isequal(v)
    assert w.dtype == v.dtype


def test_expression_repr(v):
    expr = v.ewise_add(v, binary.plus)
    assert "ewise_add" in repr(expr)
    assert "Do expr.new()" in repr(expr)


def test_autocompute(v):
    expr = v.ewise_add(v, binary.plus)
    # method on expression computes automatically
    assert expr.nvals == 4
    assert expr.isequal((v + v).new())
    with gb.config.set(autocompute=False):
        expr2 = v.ewise_add(v, binary.plus)
        with pytest.raises(TypeError, match="autocompute"):
            expr2.nvals


def test_infix_arithmetic(v):
    r = (v + 1).new()
    assert r.to_dict() == {1: 2, 3: 2, 4: 3, 6: 1}
    r = (2 * v).new()
    assert r.to_dict() == {1: 2, 3: 2, 4: 4, 6: 0}
    r = (v - v).new()
    assert r.to_dict() == {1: 0, 3: 0, 4: 0, 6: 0}
    b = (v > 0).new()
    assert b.dtype == dtypes.BOOL
    assert b.to_dict() == {1: True, 3: True, 4: True, 6: False}


def test_infix_matmul(v, A):
    r = gb.semiring.min_plus(v @ A).new()
    assert r.isequal(v.vxm(A, semiring.min_plus).new())
    s = gb.semiring.plus_times(v @ v).new()
    assert s.value == 1 + 1 + 4 + 0
    r2 = gb.op.plus_times(A @ v).new()
    assert r2.isequal(A.mxv(v, semiring.plus_times).new())


def test_bool_infix_autocompute(v):
    b1 = (v > 0).new()
    b2 = (v > 1).new()
    both = (b1.V & b2.V).new()
    assert both.nvals == 1  # write-permission intersection: only index 4
    r = (b1 & b2).new()
    assert r.to_dict() == {1: False, 3: False, 4: True, 6: False}
    with pytest.raises(TypeError, match="BOOL"):
        (v & v).new()


# --------------------------------------------------------------------- #
# Exhaustive update-semantics grid for Vector operations: every
# (mask kind x accum x replace) combination per expression kind and
# dtype class against the dense write-rule oracle (reference
# test_vector.py case sweeps, SURVEY §4).
from .helpers import (A_COLS, A_ROWS, A_VALS, gb_from_pair,
                      oracle_mask_array, oracle_update, assert_pair_equal)
from .test_oracle import _oracle_ewise_add, _oracle_ewise_mult
from .test_matrix import _GRID_OPS


def _vec_fixture(dtype):
    rng = np.random.default_rng(11)
    n = 7
    av = np.zeros((n, n), np.int64)
    ao = np.zeros((n, n), bool)
    av[A_ROWS, A_COLS] = A_VALS
    ao[A_ROWS, A_COLS] = True
    uo = rng.random(n) < 0.6
    uv = rng.integers(0, 9, n)
    wo = rng.random(n) < 0.5
    wv = rng.integers(1, 9, n)
    co = rng.random(n) < 0.5
    cv = rng.integers(1, 9, n)
    mo = rng.random(n) < 0.7
    mv = rng.integers(0, 3, n)
    np_t = {"INT64": np.int64, "FP64": np.float64, "BOOL": np.bool_}[dtype]

    def cast(v, o):
        if np_t is np.bool_:
            return (v % 2).astype(bool) & o, o
        return np.where(o, v, 0).astype(np_t), o

    return (cast(av, ao), cast(uv, uo), cast(wv, wo), cast(cv, co),
            (mv.astype(np_t), mo))


def _oracle_vxm(uv, uo, av, ao, add_f, add_ident, mult_f):
    n = av.shape[1]
    out = np.full(n, add_ident, dtype=np.result_type(uv, av))
    out_ok = np.zeros(n, bool)
    for j in range(n):
        acc = None
        for k in range(av.shape[0]):
            if uo[k] and ao[k, j]:
                p = mult_f(uv[k], av[k, j])
                acc = p if acc is None else add_f(acc, p)
        if acc is not None:
            out[j] = acc
            out_ok[j] = True
    return np.where(out_ok, out, 0), out_ok


@pytest.mark.parametrize("dtype", ["INT64", "FP64", "BOOL"])
@pytest.mark.parametrize(
    "exprkind", ["vxm", "vxm_at", "mxv", "ewise_add", "ewise_mult",
                 "apply", "select", "inner_ewise_union"])
def test_vector_update_semantics_grid(dtype, exprkind):
    if exprkind in ("select", "inner_ewise_union") and dtype == "BOOL":
        pytest.skip("numeric-only grid rows")
    ops = _GRID_OPS[dtype]
    ((av, ao), (uv, uo), (wv, wo), (cv0, co0),
     (mv, mo)) = _vec_fixture(dtype)
    A = gb_from_pair(av, ao)
    u = gb_from_pair(uv, uo)
    w = gb_from_pair(wv, wo)
    M = gb_from_pair(np.where(mo, mv, 0), mo)
    ring = getattr(gb.semiring, ops["ring"])[dtype]

    if exprkind == "vxm":
        z_vals, z_ok = _oracle_vxm(uv, uo, av, ao, ops["add_f"],
                                   ops["add_ident"], ops["mult_f"])
        mk = lambda: u.vxm(A, ring)  # noqa: E731
    elif exprkind == "vxm_at":
        z_vals, z_ok = _oracle_vxm(uv, uo, av.T, ao.T, ops["add_f"],
                                   ops["add_ident"], ops["mult_f"])
        mk = lambda: u.vxm(A.T, ring)  # noqa: E731
    elif exprkind == "mxv":
        z_vals, z_ok = _oracle_vxm(uv, uo, av.T, ao.T, ops["add_f"],
                                   ops["add_ident"], ops["mult_f"])
        mk = lambda: A.mxv(u, ring)  # noqa: E731
    elif exprkind == "ewise_add":
        z_vals, z_ok = _oracle_ewise_add(uv, uo, wv, wo, ops["add_f"])
        mk = lambda: u.ewise_add(w, getattr(gb.binary, ops["add"]))  # noqa: E731
    elif exprkind == "ewise_mult":
        z_vals, z_ok = _oracle_ewise_mult(uv, uo, wv, wo, ops["mult_f"])
        mk = lambda: u.ewise_mult(w, getattr(gb.binary, ops["mult"]))  # noqa: E731
    elif exprkind == "apply":
        z_vals, z_ok = ops["un_f"](uv), uo
        mk = lambda: u.apply(getattr(gb.unary, ops["un"]))  # noqa: E731
    elif exprkind == "inner_ewise_union":
        both = uo | wo
        z_vals = np.where(uo, uv, 9) + np.where(wo, wv, 7)
        z_vals, z_ok = np.where(both, z_vals, 0), both
        mk = lambda: u.ewise_union(w, gb.binary.plus, 9, 7)  # noqa: E731
    else:  # select
        keep = uo & (uv > 2)
        z_vals, z_ok = np.where(keep, uv, 0), keep
        mk = lambda: u.select(gb.select.valuegt, 2)  # noqa: E731
    z_vals = np.where(z_ok, z_vals, 0)

    from .test_matrix import _mask_cases
    isfloat = dtype == "FP64"
    for mname, mobj, marr in _mask_cases(M, mv, mo):
        for accum_name in [None] + ops["accums"]:
            for replace in (False, True):
                if mobj is None and replace:
                    continue
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
