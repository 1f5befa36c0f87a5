"""Matrix recipe operations: kronecker, power, reposition, diag, transpose
assignment — expected values verbatim from the reference suite
(graphblas/tests/test_matrix.py:1714, 3781, 4367; test_vector.py diag).
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, semiring
from graphblas_tpu.exceptions import DimensionMismatch

from .helpers import make_A, make_v

Matrix = gb.Matrix
Vector = gb.Vector


@pytest.fixture
def A():
    return make_A()


def test_kronecker_exact():
    # reference test_matrix.py:1714
    A = Matrix.from_coo([0, 1, 1], [0, 0, 1], [1, 2, 3])
    B = Matrix.from_coo([0, 0, 1, 1], [1, 2, 0, 2], [2, 3, 8, 4])
    result = Matrix.from_coo(
        [0, 0, 1, 1, 2, 2, 2, 2, 3, 3, 3, 3],
        [1, 2, 0, 2, 1, 2, 4, 5, 0, 2, 3, 5],
        [2, 3, 8, 4, 4, 6, 6, 9, 16, 8, 24, 12],
    )
    C = A.kronecker(B, binary.times).new()
    assert C.isequal(result)


def test_power_vs_repeated_matmul(A):
    # reference test_matrix.py:4367
    expected = A.dup()
    for i in range(1, 12):
        result = A.power(i).new()
        assert result.isequal(expected), i
        expected << A @ expected
    expected = A.T.new()
    for i in range(1, 6):
        result = A.T.power(i).new()
        assert result.isequal(expected), i
        expected << A.T @ expected
    expected = A.dup()
    for i in range(1, 6):
        result = A.power(i, semiring.min_plus).new()
        assert result.isequal(expected), i
        expected << semiring.min_plus(A @ expected)
    with pytest.raises((TypeError, ValueError)):
        A.power(1.5)
    with pytest.raises((TypeError, ValueError)):
        A.power(-1)
    B = A[:2, :3].new()
    with pytest.raises(DimensionMismatch):
        B.power(2)


def test_reposition_grid(A):
    # reference test_matrix.py:3781 — offset sweep incl. transposes
    rows, cols, values = A.to_coo()
    rows = rows.astype(int)
    cols = cols.astype(int)

    def get_expected(row_offset, col_offset, nrows, ncols, transposed):
        r, c = (cols, rows) if transposed else (rows, cols)
        r = r + row_offset
        c = c + col_offset
        keep = (r >= 0) & (r < nrows) & (c >= 0) & (c < ncols)
        return Matrix.from_coo(r[keep], c[keep], values[keep],
                               nrows=nrows, ncols=ncols)

    for row_offset in range(-A.nrows - 2, A.nrows + 3, 3):
        for col_offset in range(-A.ncols - 2, A.ncols + 3, 3):
            for M, tflag in [(A, False), (A.T, True)]:
                result = M.reposition(row_offset, col_offset).new()
                expected = get_expected(row_offset, col_offset, M.nrows,
                                        M.ncols, tflag)
                assert result.isequal(expected)
                result = M.reposition(row_offset, col_offset,
                                      nrows=3, ncols=10).new()
                expected = get_expected(row_offset, col_offset, 3, 10, tflag)
                assert result.isequal(expected)

    result = A.reposition(3, 1).new(mask=A.S)
    expected = Matrix.from_coo([3, 4, 6], [2, 5, 3], [2, 8, 3],
                               nrows=A.nrows, ncols=A.ncols)
    assert result.isequal(expected)


def test_diag_roundtrip():
    # reference test_vector.py:620 / matrix.py:735
    v = Vector.from_coo([0, 2, 4], [1.0, 2.0, 3.0], size=5)
    D = v.diag()
    assert D.nrows == 5 and D.ncols == 5
    assert D[2, 2].new().value == 2.0
    assert D[0, 1].new().is_empty
    # k-offset diagonals
    D1 = v.diag(1)
    assert D1.nrows == 6
    assert D1[0, 1].new().value == 1.0
    Dm1 = v.diag(-1)
    assert Dm1[1, 0].new().value == 1.0
    # matrix -> vector diagonal extraction
    w = gb.ss.diag(D)
    assert w.isequal(v)


def test_transpose_assignment(A):
    # reference test_matrix.py:1742 (subset ported in test_assign too)
    C = Matrix(A.dtype, A.ncols + 1, A.nrows + 1)
    C[: A.ncols, : A.nrows] << A.T
    assert C[: A.ncols, : A.nrows].new().isequal(A.T.new())


def test_assign_list_matrix_shapes():
    # reference test_matrix.py:1759 (error grid)
    A = Matrix(int, 3, 3)
    A[[0, 1], [1, 2]] = [[3, 4], [5, 6]]
    expected = Matrix.from_coo([0, 0, 1, 1], [1, 2, 1, 2], [3, 4, 5, 6],
                               nrows=3, ncols=3)
    assert A.isequal(expected)
    A[[0, 1], 1] = np.arange(2)
    expected = Matrix.from_coo([0, 0, 1, 1], [1, 2, 1, 2], [0, 4, 1, 6],
                               nrows=3, ncols=3)
    assert A.isequal(expected)
    A[0, 1:3] = [10, 20]
    expected = Matrix.from_coo([0, 0, 1, 1], [1, 2, 1, 2], [10, 20, 1, 6],
                               nrows=3, ncols=3)
    assert A.isequal(expected)
    with pytest.raises((TypeError, ValueError)):
        A[0, 1] = [0]
    with pytest.raises((TypeError, ValueError, DimensionMismatch)):
        A[[0, 1], 1] = [0]
    with pytest.raises((TypeError, ValueError, DimensionMismatch)):
        A[[0, 1], [1, 2]] = [1, 2, 3, 4]


def test_split_concat(A):
    # reference test_matrix.py:2740-2770 (ss.split / ss.concat tiling)
    tiles = A.ss.split([4, 3])
    A2 = gb.ss.concat(tiles)
    assert A2.isequal(A)
    # double the rows by stacking
    B2 = gb.ss.concat([[A], [A]])
    assert B2.nrows == 2 * A.nrows
    assert B2[: A.nrows, :].new().isequal(A)
    assert B2[A.nrows:, :].new().isequal(A)
