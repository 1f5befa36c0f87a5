"""Assign / subassign case analysis (reference core/matrix.py:2905+ ->
GrB_{Row,Col,Matrix}_assign vs GxB_*_subassign).

Expected values are taken verbatim from the reference behavioral suite
(graphblas/tests/test_matrix.py:607-1157 and tests/test_vector.py) — they
pin the semantics the TPU engine must reproduce: C(M)[I, J] masks in
C-space; C[I, J](m) masks in the extracted region's space (submask);
replace clears only within the assigned region for subassign but the whole
mask scope for assign; accum merges old/new.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes
from graphblas_tpu.core.mask import (
    ComplementedStructuralMask,
    ComplementedValueMask,
    StructuralMask,
    ValueMask,
)
from graphblas_tpu.exceptions import DimensionMismatch

from .helpers import make_A, make_v

Matrix = gb.Matrix
Vector = gb.Vector
Scalar = gb.Scalar


@pytest.fixture
def A():
    return make_A()


@pytest.fixture
def v():
    return make_v()


def _A33():
    return Matrix.from_coo(
        [0, 0, 0, 1, 1, 1, 2, 2, 2],
        [0, 1, 2, 0, 1, 2, 0, 1, 2],
        [0, 1, 2, 3, 4, 5, 6, 7, 8],
    )


def test_assign_block(A):
    # reference test_matrix.py:607
    B = Matrix.from_coo([0, 0, 1], [0, 1, 0], [9, 8, 7])
    result = Matrix.from_coo(
        [0, 0, 2, 3, 0, 3, 5, 6, 0, 6, 1, 6, 4, 1],
        [0, 5, 0, 0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 6],
        [9, 8, 7, 3, 2, 3, 1, 5, 3, 7, 8, 3, 7, 4],
    )
    C = A.dup()
    C()[[0, 2], [0, 5]] = B
    assert C.isequal(result)
    C = A.dup()
    C[:3:2, :6:5] = B
    assert C.isequal(result)
    nvals = C.nvals
    C(C.S) << 1
    assert C.nvals == nvals
    assert C.reduce_scalar().new().value == nvals
    C << 1
    assert C.nvals == C.nrows * C.ncols


def test_assign_wrong_dims(A):
    # reference test_matrix.py:630
    B = Matrix.from_coo([0, 0, 1], [0, 1, 0], [9, 8, 7])
    with pytest.raises(DimensionMismatch):
        A[[0, 2, 4], [0, 5]] = B


def test_assign_row(A, v):
    # reference test_matrix.py:636
    result = Matrix.from_coo(
        [3, 3, 5, 6, 6, 1, 6, 2, 4, 1, 0, 0, 0, 0],
        [0, 2, 2, 2, 3, 4, 4, 5, 5, 6, 1, 3, 4, 6],
        [3, 3, 1, 5, 7, 8, 3, 1, 7, 4, 1, 1, 2, 0],
    )
    C = A.dup()
    C[0, :] = v
    assert C.isequal(result)


def test_assign_column(A, v):
    # reference test_matrix.py:770
    result = Matrix.from_coo(
        [3, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1, 1, 3, 4, 6],
        [0, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6, 1, 1, 1, 1],
        [3, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4, 1, 1, 2, 0],
    )
    C = A.dup()
    C[:, 1] = v
    assert C.isequal(result)


def test_subassign_row_col():
    # reference test_matrix.py:647 — masks scope to the extracted region
    A = _A33()
    m = Vector.from_coo([1], [True])
    w = Vector.from_coo([0, 1], [10, 20])

    A[[0, 1], 0](m.S) << w
    assert A.isequal(Matrix.from_coo(
        [0, 0, 0, 1, 1, 1, 2, 2, 2],
        [0, 1, 2, 0, 1, 2, 0, 1, 2],
        [0, 1, 2, 20, 4, 5, 6, 7, 8]))

    A[1, [1, 2]](m.V, accum=binary.plus).update(w)
    assert A.isequal(Matrix.from_coo(
        [0, 0, 0, 1, 1, 1, 2, 2, 2],
        [0, 1, 2, 0, 1, 2, 0, 1, 2],
        [0, 1, 2, 20, 4, 25, 6, 7, 8]))

    A[[0, 1], 0](m.S, binary.plus, replace=True) << w
    assert A.isequal(Matrix.from_coo(
        [0, 0, 1, 1, 1, 2, 2, 2],
        [1, 2, 0, 1, 2, 0, 1, 2],
        [1, 2, 40, 4, 25, 6, 7, 8]))

    with pytest.raises(DimensionMismatch):
        A(m.S)[[0, 1], 0] << w

    A[[0, 1], 0](m.S) << 99
    assert A.isequal(Matrix.from_coo(
        [0, 0, 1, 1, 1, 2, 2, 2],
        [1, 2, 0, 1, 2, 0, 1, 2],
        [1, 2, 99, 4, 25, 6, 7, 8]))

    A[[1, 2], 0](m.S, binary.plus, replace=True) << 100
    assert A.isequal(Matrix.from_coo(
        [0, 0, 1, 1, 2, 2, 2],
        [1, 2, 1, 2, 0, 1, 2],
        [1, 2, 4, 25, 106, 7, 8]))

    A[2, [0, 1]](m.S) << -1
    assert A.isequal(Matrix.from_coo(
        [0, 0, 1, 1, 2, 2, 2],
        [1, 2, 1, 2, 0, 1, 2],
        [1, 2, 4, 25, 106, -1, 8]))


def test_subassign_matrix():
    # reference test_matrix.py:708
    A = _A33()
    m = Matrix.from_coo([1], [0], [True])
    w = Matrix.from_coo([0, 1], [0, 0], [10, 20])
    mT = m.T.new()

    A[[0, 1], [0]](m.S) << w
    assert A.isequal(Matrix.from_coo(
        [0, 0, 0, 1, 1, 1, 2, 2, 2],
        [0, 1, 2, 0, 1, 2, 0, 1, 2],
        [0, 1, 2, 20, 4, 5, 6, 7, 8]))

    A[[1], [1, 2]](mT.V, accum=binary.plus) << w.T
    assert A.isequal(Matrix.from_coo(
        [0, 0, 0, 1, 1, 1, 2, 2, 2],
        [0, 1, 2, 0, 1, 2, 0, 1, 2],
        [0, 1, 2, 20, 4, 25, 6, 7, 8]))

    A[[0, 1], [0]](m.S, binary.plus, replace=True) << w
    assert A.isequal(Matrix.from_coo(
        [0, 0, 1, 1, 1, 2, 2, 2],
        [1, 2, 0, 1, 2, 0, 1, 2],
        [1, 2, 40, 4, 25, 6, 7, 8]))

    with pytest.raises(DimensionMismatch):
        A(m.S)[[0, 1], [0]] << w

    A[[0, 1], [0]](m.S) << 99
    assert A.isequal(Matrix.from_coo(
        [0, 0, 1, 1, 1, 2, 2, 2],
        [1, 2, 0, 1, 2, 0, 1, 2],
        [1, 2, 99, 4, 25, 6, 7, 8]))

    A[[1, 2], [0]](m.S, binary.plus, replace=True) << 100
    assert A.isequal(Matrix.from_coo(
        [0, 0, 1, 1, 2, 2, 2],
        [1, 2, 1, 2, 0, 1, 2],
        [1, 2, 4, 25, 106, 7, 8]))

    A[[2], [0, 1]](mT.S) << -1
    assert A.isequal(Matrix.from_coo(
        [0, 0, 1, 1, 2, 2, 2],
        [1, 2, 1, 2, 0, 1, 2],
        [1, 2, 4, 25, 106, -1, 8]))


def test_assign_row_scalar_mask_scoping(A, v):
    # reference test_matrix.py:781 — C[0,:](v.S) << v equals C(v.S)[0,:] << v
    C = A.dup()
    C[0, :](v.S) << v
    D = A.dup()
    D(v.S)[0, :] << v
    assert C.isequal(D)

    C[:, :](C.S) << 1

    C = A.dup()
    C(v.S)[0, :] = 10
    result = Matrix.from_coo(
        [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1, 0, 0],
        [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6, 4, 6],
        [3, 10, 3, 1, 5, 10, 7, 8, 3, 1, 7, 4, 10, 10],
    )
    assert C.isequal(result)


def test_assign_row_col_matrix_mask():
    # reference test_matrix.py:823 — the full C-mask row/col assign grid
    A0 = Matrix.from_coo([0, 0, 1], [0, 1, 0], [0, 1, 2])
    B = Matrix.from_coo([0, 1, 1], [0, 0, 1], [4, 0, 5])
    v2 = Vector.from_coo([0, 1], [10, 20])

    C = A0.dup()
    C(B.S)[0, :] << v2
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [10, 1, 2]))

    C = A0.dup()
    C(B.S, accum=binary.plus)[1, :] = v2
    assert C.isequal(Matrix.from_coo([0, 0, 1, 1], [0, 1, 0, 1],
                                     [0, 1, 12, 20]))

    C = A0.dup()
    C(B.S, replace=True)[1, :] << v2
    assert C.isequal(Matrix.from_coo([0, 1, 1], [0, 0, 1], [0, 10, 20]))

    C = A0.dup()
    C(B.S)[:, 0] = v2
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [10, 1, 20]))

    C = A0.dup()
    C(B.S, accum=binary.plus)[:, 1] << v2
    assert C.isequal(Matrix.from_coo([0, 0, 1, 1], [0, 1, 0, 1],
                                     [0, 1, 2, 20]))

    C = A0.dup()
    C(B.S, replace=True)[:, 1] = v2
    assert C.isequal(Matrix.from_coo([0, 1, 1], [0, 0, 1], [0, 2, 20]))

    # scalar variants
    C = A0.dup()
    C(B.S)[0, :] = 100
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [100, 1, 2]))

    C = A0.dup()
    C(B.S, accum=binary.plus)[1, :] << 100
    assert C.isequal(Matrix.from_coo([0, 0, 1, 1], [0, 1, 0, 1],
                                     [0, 1, 102, 100]))

    C = A0.dup()
    C(B.S, replace=True)[1, :] = 100
    assert C.isequal(Matrix.from_coo([0, 1, 1], [0, 0, 1], [0, 100, 100]))

    C = A0.dup()
    C(B.S)[:, 0] << 100
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [100, 1, 100]))

    C = A0.dup()
    C(B.S, accum=binary.plus)[:, 1] = 100
    assert C.isequal(Matrix.from_coo([0, 0, 1, 1], [0, 1, 0, 1],
                                     [0, 1, 2, 100]))

    C = A0.dup()
    C(B.S, replace=True)[:, 1] << 100
    assert C.isequal(Matrix.from_coo([0, 1, 1], [0, 0, 1], [0, 2, 100]))


def test_subassign_row_col_submask():
    # reference test_matrix.py:896-966 — submask variants + error contract
    A0 = Matrix.from_coo([0, 0, 1], [0, 1, 0], [0, 1, 2])
    B = Matrix.from_coo([0, 1, 1], [0, 0, 1], [4, 0, 5])
    v1 = Vector.from_coo([0], [100])
    v2 = Vector.from_coo([0, 1], [10, 20])

    C = A0.dup()
    C[0, :](v2.S) << v2
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [10, 20, 2]))

    C = A0.dup()
    C[0, [0]](v1.S) << v1
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [100, 1, 2]))

    C = A0.dup()
    C[:, 0](v2.S) << v2
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [10, 1, 20]))

    C = A0.dup()
    C[[0], 0](v1.S) << v1
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [100, 1, 2]))

    C = A0.dup()
    C[0, :](v2.S) << 100
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [100, 100, 2]))

    C = A0.dup()
    C[:, 0](v2.S) << 100
    assert C.isequal(Matrix.from_coo([0, 0, 1], [0, 1, 0], [100, 1, 100]))

    with pytest.raises(TypeError):
        C[0, :](B.S) << v2
    with pytest.raises(TypeError):
        C[:, 0](B.S) << v2
    with pytest.raises(TypeError):
        C[:, 0](B.S) << 100


@pytest.mark.parametrize("index", [slice(12), list(range(12))])
def test_subassign_combos(index):
    # reference test_matrix.py:966 — every mask type x replace over a
    # fixture where mask/value/self structures all differ
    mask_base = Vector.from_coo(
        [0, 1, 2, 3, 4, 5, 6, 7], [1, 1, 1, 1, 0, 0, 0, 0], size=12)
    val_base = Vector.from_coo([0, 1, 4, 5, 8, 9], [1, 2, 3, 4, 5, 6],
                               size=12)
    self_base = Vector.from_coo([0, 2, 4, 6, 8, 10, 12],
                                [10, 20, 30, 40, 50, 60, 70], size=14)
    params = [  # mask_type, replace, indices, values
        (StructuralMask, False, [0, 1, 2, 4, 5, 6, 8, 10, 12],
         [11, 2, 20, 33, 4, 40, 50, 60, 70]),
        (ValueMask, False, [0, 1, 2, 4, 6, 8, 10, 12],
         [11, 2, 20, 30, 40, 50, 60, 70]),
        (ComplementedStructuralMask, False, [0, 2, 4, 6, 8, 9, 10, 12],
         [10, 20, 30, 40, 55, 6, 60, 70]),
        (ComplementedValueMask, False, [0, 2, 4, 5, 6, 8, 9, 10, 12],
         [10, 20, 33, 4, 40, 55, 6, 60, 70]),
        (StructuralMask, True, [0, 1, 2, 4, 5, 6, 12],
         [11, 2, 20, 33, 4, 40, 70]),
        (ValueMask, True, [0, 1, 2, 12], [11, 2, 20, 70]),
        (ComplementedStructuralMask, True, [8, 9, 10, 12],
         [55, 6, 60, 70]),
        (ComplementedValueMask, True, [4, 5, 6, 8, 9, 10, 12],
         [33, 4, 40, 55, 6, 60, 70]),
    ]
    for mask_type, replace, indices, values in params:
        self = self_base.dup()
        self[index](binary.plus, mask_type(mask_base), replace=replace) \
            << val_base
        expected = Vector.from_coo(indices, values, size=14)
        assert self.isequal(expected), (mask_type.__name__, replace)

    def asrow(w):
        Row = Matrix(w.dtype, nrows=1, ncols=w.size)
        Row[0, :] = w
        return Row

    def ascol(w):
        Col = Matrix(w.dtype, nrows=w.size, ncols=1)
        Col[:, 0] = w
        return Col

    for mask_type, replace, indices, values in params:
        self = asrow(self_base)
        self[0, index](binary.plus, mask_type(mask_base), replace=replace) \
            << val_base
        assert self.isequal(asrow(Vector.from_coo(indices, values, size=14))), \
            ("row", mask_type.__name__, replace)

    for mask_type, replace, indices, values in params:
        self = ascol(self_base)
        self[index, 0](binary.plus, mask_type(mask_base), replace=replace) \
            << val_base
        assert self.isequal(ascol(Vector.from_coo(indices, values, size=14))), \
            ("col", mask_type.__name__, replace)

    for mask_type, replace, indices, values in params:
        self = asrow(self_base)
        self[[0], index](binary.plus, mask_type(asrow(mask_base)),
                         replace=replace) << asrow(val_base)
        assert self.isequal(asrow(Vector.from_coo(indices, values, size=14))), \
            ("mat", mask_type.__name__, replace)


def test_assign_column_scalar(A, v):
    # reference test_matrix.py:1057
    C = A.dup()
    C[:, 0](v.S) << v
    D = A.dup()
    D(v.S)[:, 0] << v
    assert C.isequal(D)

    C = A.dup()
    C[:, 1] = v
    C(v.S)[:, 1] = 10
    result = Matrix.from_coo(
        [3, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1, 1, 3, 4, 6],
        [0, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6, 1, 1, 1, 1],
        [3, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4, 10, 10, 10, 10],
    )
    assert C.isequal(result)

    C(v.V, replace=True, accum=binary.plus)[:, 1] = 20
    result = Matrix.from_coo(
        [3, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1, 1, 3, 4],
        [0, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6, 1, 1, 1],
        [3, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4, 30, 30, 30],
    )
    assert C.isequal(result)


def test_assign_scalar_region_shapes(A):
    # reference test_matrix.py:1083 — block / row / column scalar assigns
    result_block = Matrix.from_coo(
        [3, 0, 6, 0, 6, 6, 2, 4, 1, 1, 3, 5, 1, 3, 5],
        [0, 1, 2, 3, 3, 4, 5, 5, 6, 2, 2, 2, 4, 4, 4],
        [3, 2, 5, 3, 7, 3, 1, 7, 4, 0, 0, 0, 0, 0, 0],
    )
    C = A.dup()
    C[[1, 3, 5], [2, 4]] = 0
    assert C.isequal(result_block)
    C = A.dup()
    C[[1, 3, 5], [2, 4]] = Scalar.from_value(0)
    assert C.isequal(result_block)
    C = A.dup()
    C[1::2, 2:5:2] = 0
    assert C.isequal(result_block)

    result_row = Matrix.from_coo(
        [3, 0, 6, 0, 6, 6, 2, 4, 1, 3, 5, 1, 1],
        [0, 1, 2, 3, 3, 4, 5, 5, 6, 2, 2, 2, 4],
        [3, 2, 5, 3, 7, 3, 1, 7, 4, 3, 1, 0, 0],
    )
    C = A.dup()
    C[1, [2, 4]] = 0
    assert C.isequal(result_row)
    C = A.dup()
    C[1, 2] = Scalar.from_value(0)
    C[1, 4] = Scalar.from_value(0)
    assert C.isequal(result_row)
    C = A.dup()
    C[1, 2:5:2] = 0
    assert C.isequal(result_row)

    result_column = Matrix.from_coo(
        [3, 0, 6, 0, 6, 6, 2, 4, 1, 1, 1, 3, 5],
        [0, 1, 2, 3, 3, 4, 5, 5, 6, 4, 2, 2, 2],
        [3, 2, 5, 3, 7, 3, 1, 7, 4, 8, 0, 0, 0],
    )
    C = A.dup()
    C[[1, 3, 5], 2] = 0
    assert C.isequal(result_column)
    C = A.dup()
    C[1::2, 2] = 0
    assert C.isequal(result_column)


def test_assign_empty_scalar_deletes():
    # reference test_matrix.py:1128-1134: assigning an empty Scalar removes
    B = Matrix.from_coo([0, 0, 1, 1], [0, 1, 0, 1], 1)
    B[1, 1] = Scalar(B.dtype)
    expected = Matrix.from_coo([0, 0, 1], [0, 1, 0], 1)
    assert B.isequal(expected)


def test_assign_bad(A):
    # reference test_matrix.py:1136 — type errors
    with pytest.raises(TypeError):
        A[0, 0] = object()
    with pytest.raises(TypeError):
        A[:, 0] = object()
    with pytest.raises(TypeError):
        A[0, 0] = A
    with pytest.raises(TypeError):
        A[:, 0] = A
    v = A[0, :].new()
    with pytest.raises(TypeError):
        A[0, 0] = v
    with pytest.raises(TypeError):
        A[:, :] = v


def test_assign_transpose(A):
    # reference test_matrix.py:1742
    C = Matrix(A.dtype, A.ncols, A.nrows)
    C[:, :] = A.T
    assert C.isequal(A.T.new())


def test_assign_list():
    # reference test_matrix.py:1759 — list/array values assign
    A = Matrix(int, 3, 3)
    A[[0, 1], [1, 2]] = [[2, 3], [4, 5]]
    expected = Matrix.from_coo([0, 0, 1, 1], [1, 2, 1, 2], [2, 3, 4, 5],
                               nrows=3, ncols=3)
    assert A.isequal(expected)
    A = Matrix(int, 3, 3)
    A[[0, 1], [1, 2]] = np.arange(4).reshape(2, 2)
    expected = Matrix.from_coo([0, 0, 1, 1], [1, 2, 1, 2], [0, 1, 2, 3],
                               nrows=3, ncols=3)
    assert A.isequal(expected)
    A = Matrix(int, 3, 3)
    A[0, [1, 2]] = [2, 3]
    expected = Matrix.from_coo([0, 0], [1, 2], [2, 3], nrows=3, ncols=3)
    assert A.isequal(expected)
    with pytest.raises((DimensionMismatch, ValueError, TypeError)):
        A[[0, 1], [1, 2]] = [1, 2, 3]


def test_del_element_masked():
    # del C(M)[i, j] — masked delete (reference core/expr.py:449-463)
    A = _A33()
    del A[1, 1]
    assert A.nvals == 8
    assert A[1, 1].new().is_empty
    from graphblas_tpu.exceptions import IndexOutOfBound

    with pytest.raises(IndexOutOfBound):
        del A[10, 0]
