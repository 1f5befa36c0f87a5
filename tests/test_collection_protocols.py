"""Collection protocol behaviors from the reference's test_matrix.py /
test_vector.py breadth that live nowhere else in this suite: python
protocol edges (bool/iter/contains/weakref/array), error contracts, and
expression-as-collection ergonomics."""

import weakref

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector, binary, dtypes, monoid


@pytest.fixture
def A():
    return Matrix.from_coo([0, 0, 1, 2], [1, 2, 0, 2], [1, 2, 3, 4],
                           nrows=3, ncols=3, name="A")


@pytest.fixture
def v():
    return Vector.from_coo([0, 2], [1.5, 2.5], size=4, name="v")


def test_no_bool_on_collections(A, v):
    with pytest.raises(TypeError):
        bool(A)
    with pytest.raises(TypeError):
        bool(v)


def test_eq_returns_elementwise_matrix(A):
    # == is elementwise (intersection), NOT a python bool (reference
    # test_no_bool_or_eq); use isequal for object equality
    out = (A == A).new()
    assert isinstance(out, Matrix)
    assert out.dtype == dtypes.BOOL
    assert out.nvals == A.nvals
    assert A.isequal(A)


def test_contains(A, v):
    assert (0, 1) in A
    assert (1, 1) not in A
    assert 0 in v
    assert 1 not in v


def test_iter_yields_indices(A, v):
    assert sorted(iter(A)) == [(0, 1), (0, 2), (1, 0), (2, 2)]
    assert sorted(iter(v)) == [0, 2]


def test_weakref_supported(A, v):
    assert weakref.ref(A)() is A
    assert weakref.ref(v)() is v
    assert weakref.ref(Scalar.from_value(1))() is not None


def test_not_implicitly_to_array(A):
    # np.array(Matrix) must not silently densify (reference
    # test_not_to_array)
    with pytest.raises(Exception):
        np.array(A)


def test_get_with_default(A, v):
    assert A.get(0, 1) == 1
    assert A.get(1, 1) is None
    assert A.get(1, 1, default=-1) == -1
    assert v.get(2) == 2.5
    assert v.get(3, default=0.0) == 0.0


def test_ndim_and_shape(A, v):
    assert A.ndim == 2 and v.ndim == 1
    assert A.shape == (3, 3) and v.shape == (4,)
    s = Scalar.from_value(1)
    assert s.ndim == 0 and s.shape == ()


def test_incompatible_shapes_raise(A):
    B = Matrix.from_coo([0], [0], [1], nrows=2, ncols=2)
    with pytest.raises(Exception):
        A.mxm(B).new()
    with pytest.raises(Exception):
        A.ewise_add(B).new()
    w = Vector.from_coo([0], [1], size=2)
    with pytest.raises(Exception):
        A.mxv(w).new()


def test_bad_update_target(A):
    with pytest.raises(TypeError):
        A << object()


def test_assign_transposed_source(A):
    C = Matrix(A.dtype, 3, 3)
    C << A.T
    assert C.isequal(A.T.new())
    # assigning INTO a transposed view is not a thing
    with pytest.raises(Exception):
        A.T << C


def test_nested_expression_evaluation(A, v0=None):
    x = Vector.from_coo([0, 1, 2], [1, 1, 1])
    inner = A.mxv(x, gb.semiring.plus_times).new()
    outer = A.mxv(inner, gb.semiring.plus_times).new()
    # same thing through autocompute of a nested expression operand
    outer2 = A.mxv(A.mxv(x, gb.semiring.plus_times),
                   gb.semiring.plus_times).new()
    assert outer.isequal(outer2)


def test_expr_is_like_matrix(A):
    expr = A.ewise_mult(A, binary.times)
    # autocompute: collection attributes work on bare expressions
    assert expr.nvals == A.nvals
    assert expr.nrows == 3
    assert expr.dup().isequal(expr.new())
    assert sorted(iter(expr)) == sorted(iter(A))


def test_index_expr_is_like_matrix(A):
    sub = A[0:2, :]
    assert sub.nrows == 2
    assert sub.new().nrows == 2


def test_wait_chains(A):
    # wait() returns self for chaining (reference test_wait_chains)
    assert A.wait() is A
    assert A.wait(how="complete") is A
    with pytest.raises(ValueError):
        A.wait(how="bogus")


def test_delete_via_scalar_assign(A):
    # masked empty-scalar assign removes elements (reference
    # test_delete_via_scalar; core/expr.py:449-463 contract)
    del A[0, 1]
    assert (0, 1) not in A
    assert A.nvals == 3


def test_dup_expression(A):
    got = A.ewise_mult(A, binary.plus).dup(dtype="FP64")
    assert got.dtype == dtypes.FP64
    assert got[0, 1].new().value == 2.0


def test_to_coo_sort_and_subset(A):
    r, c, vals = A.to_coo(sort=True)
    assert list(r) == sorted(r)
    rows_only = A.to_coo(rows=True, columns=False, values=False)
    assert rows_only[1] is None and rows_only[2] is None
    assert sorted(rows_only[0]) == [0, 0, 1, 2]


def test_bool_matrix_used_as_mask(A):
    M = Matrix.from_coo([0, 2], [1, 2], [True, True], nrows=3, ncols=3)
    C = Matrix(A.dtype, 3, 3)
    C(M.V) << A
    assert C.to_dicts() == {0: {1: 1}, 2: {2: 4}}


def test_scalar_expressions_bool_ok():
    # scalar-valued expressions DO support bool (reference
    # test_bool_eq_on_scalar_expressions)
    v = Vector.from_coo([0, 1], [1, 2])
    assert bool(v.reduce(monoid.plus))
    assert int(v.reduce(monoid.plus)) == 3
    assert float(v[0]) == 1.0


def test_vector_inner_outer(v):
    w = Vector.from_coo([0, 2], [2.0, 4.0], size=4)
    assert v.inner(w).new().value == 1.5 * 2 + 2.5 * 4
    O = v.outer(w, binary.times).new()
    assert O.nvals == 4
    assert O[0, 0].new().value == 3.0


def test_diag_roundtrip(v):
    M = v.diag()
    assert M.nrows == 4 and M.ncols == 4
    back = M.diag()
    assert back.isequal(v)
