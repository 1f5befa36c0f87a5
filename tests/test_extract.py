"""Extract case analysis (reference core/matrix.py:2811-3330 ->
GrB_Matrix_extract / GrB_Col_extract; input_mask semantics
core/expr.py:333-377).

Expected values from the reference behavioral suite
(graphblas/tests/test_matrix.py:427-605, tests/test_vector.py).
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import dtypes

from .helpers import make_A, make_v

Matrix = gb.Matrix
Vector = gb.Vector


@pytest.fixture
def A():
    return make_A()


@pytest.fixture
def v():
    return make_v()


def test_extract_block(A):
    # reference test_matrix.py:427
    C = Matrix(A.dtype, 3, 4)
    result = Matrix.from_coo(
        [0, 0, 1, 2, 2, 2], [0, 2, 1, 1, 2, 3], [2, 3, 3, 5, 7, 3],
        nrows=3, ncols=4)
    C << A[[0, 3, 6], [1, 2, 3, 4]]
    assert C.isequal(result)
    C << A[0::3, 1:5]
    assert C.isequal(result)
    C << A[[0, 3, 6], 1:5:1]
    assert C.isequal(result)
    C2 = A[[0, 3, 6], [1, 2, 3, 4]].new()
    assert C2.isequal(result)


def test_extract_row(A):
    # reference test_matrix.py:442
    w = Vector(A.dtype, 3)
    result = Vector.from_coo([1, 2], [5, 3], size=3)
    w << A[6, [0, 2, 4]]
    assert w.isequal(result)
    w << A[6, :5:2]
    assert w.isequal(result)
    w << A.T[[0, 2, 4], 6]
    assert w.isequal(result)
    w2 = A[6, [0, 2, 4]].new()
    assert w2.isequal(result)
    w3 = A[6, np.array([0, 2, 4])].new()
    assert w3.isequal(result)
    with pytest.raises(TypeError):
        A[6, np.array([0, 2, 4], dtype=float)]
    with pytest.raises(TypeError):
        A[6, np.array([[0, 2, 4]])]


def test_extract_column(A):
    # reference test_matrix.py:464
    w = Vector(A.dtype, 3)
    result = Vector.from_coo([1, 2], [3, 1], size=3)
    w << A[[1, 3, 5], 2]
    assert w.isequal(result)
    w << A[1:6:2, 2]
    assert w.isequal(result)
    w << A.T[2, [1, 3, 5]]
    assert w.isequal(result)
    w2 = A[1:6:2, 2].new()
    assert w2.isequal(result)


def test_extract_negative_and_backwards(A):
    # slice tricks (reference core/slice.py:20 GxB_BACKWARDS/RANGE)
    full = A[6, :].new()
    rev = A[6, ::-1].new()
    idx_f, val_f = full.to_coo()
    idx_r, val_r = rev.to_coo()
    n = A.ncols
    np.testing.assert_array_equal(
        np.sort((n - 1 - idx_r.astype(np.int64))), np.sort(idx_f.astype(np.int64)))
    # negative scalar index
    assert A[-1, 2].new().value == A[6, 2].new().value


def test_extract_input_mask_matrix():
    # reference test_matrix.py:477 — the input_mask case grid
    A = Matrix.from_coo(
        [0, 0, 0, 1, 1, 1],
        [0, 1, 2, 0, 1, 2],
        [0, 1, 2, 3, 4, 5],
    )
    M = Matrix.from_coo(
        [0, 0, 1, 1],
        [1, 2, 0, 1],
        [0, 1, 2, 3],
    )
    m = M[0, :].new()
    MT = M.T.new()

    result = A[0, [0, 1]].new(input_mask=M.S)
    expected = Vector.from_coo([1], [1])
    assert result.isequal(expected)
    result.clear()
    result(input_mask=M.S) << A[0, [0, 1]]
    assert result.isequal(expected)

    # Vector input mask
    result = A[0, [0, 1]].new(input_mask=m.S)
    assert result.isequal(expected)

    # Value mask
    result = A[0, [1, 2]].new(input_mask=M.V)
    expected = Vector.from_coo([1], [2], size=2)
    assert result.isequal(expected)

    # error contract
    with pytest.raises(ValueError):
        A[0, [0, 1]].new(input_mask=MT.S)
    with pytest.raises(ValueError):
        A[0, [0]].new(input_mask=expected.S)
    with pytest.raises(ValueError):
        A[[0], 0].new(input_mask=m.S)
    with pytest.raises(TypeError):
        A[[0], [0]].new(input_mask=expected.S)
    with pytest.raises((ValueError, TypeError)):
        A[0, 0].new(input_mask=M.S)
    with pytest.raises(TypeError):
        A[0, [0, 1]].new(input_mask=M.S, mask=expected.S)
    with pytest.raises(TypeError):
        A(input_mask=M.S, mask=expected.S)
    with pytest.raises(TypeError):
        A[0, [0, 1]].new(input_mask=M)
    with pytest.raises(TypeError):
        A(input_mask=M.S) << A.apply(gb.unary.ainv)
    with pytest.raises(TypeError):
        A(input_mask=M.S)[[0], [0]] = 1

    # transposed input value
    result = A.T[[0, 1], 0].new(input_mask=MT.S)
    expected = Vector.from_coo([1], [1])
    assert result.isequal(expected)
    result = A.T[[0, 1], 0].new(input_mask=m.S)
    assert result.isequal(expected)
    result = A.T[[1, 2], 0].new(input_mask=MT.V)
    expected = Vector.from_coo([1], [2], size=2)
    assert result.isequal(expected)


def test_extract_with_bad_index_type(A):
    with pytest.raises(TypeError):
        A[A.T, 1].new()
    with pytest.raises(TypeError):
        A[A, [1]] = A


def test_extract_element_fast_paths(A):
    # reference test_matrix.py:275 — extractElement + NoValue
    assert A[3, 0].new().value == 3
    assert A[1, 6].new().value == 4
    s = A[0, 0].new()
    assert s.is_empty
    assert s.value is None
    # default fill via get
    assert A.get(0, 0) is None
    assert A.get(0, 0, "missing") == "missing"
    assert A.get(3, 0) == 3


def test_extract_vector_cases(v):
    # reference test_vector.py extract coverage
    w = v[[0, 1, 3]].new()
    assert w.isequal(Vector.from_coo([1, 2], [1, 1], size=3))
    w = v[1::2].new()
    assert w.isequal(Vector.from_coo([0, 1], [1, 1], size=3))
    w = v[::-1].new()
    idx, vals = w.to_coo()
    n = v.size
    exp_idx, exp_vals = v.to_coo()
    np.testing.assert_array_equal(
        np.sort(n - 1 - idx.astype(np.int64)), np.sort(exp_idx.astype(np.int64)))
    s = v[1].new()
    assert s.value == 1
    assert v[0].new().is_empty


def test_extract_masked_and_accum(A):
    # extract straight into a masked/accum updater
    m = Vector.from_coo([0, 2], [True, True], size=3)
    w = Vector.from_coo([0, 1, 2], [100, 100, 100], size=3)
    w(m.S) << A[6, [0, 2, 4]]
    # region values: [_, 5, 3]; spec formula C<M> = (M.Z) U (~M.C): slot 0
    # is masked with empty Z -> DELETED; slot 1 unmasked keeps 100; slot 2
    # masked takes 3
    assert w.isequal(Vector.from_coo([1, 2], [100, 3], size=3))
    w2 = Vector.from_coo([0, 1, 2], [100, 100, 100], size=3)
    w2(m.S, replace=True) << A[6, [0, 2, 4]]
    # replace clears masked slots with no incoming value and unmasked slots
    assert w2.isequal(Vector.from_coo([2], [3], size=3))
    w3 = Vector.from_coo([0, 1, 2], [100, 100, 100], size=3)
    w3(accum=gb.binary.plus) << A[6, [0, 2, 4]]
    assert w3.isequal(Vector.from_coo([0, 1, 2], [100, 105, 103], size=3))
