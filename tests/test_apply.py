"""Apply case analysis: unary / bound-binary / indexunary spellings.

Expected values verbatim from the reference suite
(graphblas/tests/test_matrix.py:1158-1300).
"""

import pickle

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes, indexunary, monoid, select, unary

from .helpers import make_A

Matrix = gb.Matrix
Scalar = gb.Scalar

RIDX = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
CIDX = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]


@pytest.fixture
def A():
    return make_A()


def test_apply_unary_exact(A):
    # reference test_matrix.py:1158
    result = Matrix.from_coo(
        RIDX, CIDX, [-3, -2, -3, -1, -5, -3, -7, -8, -3, -1, -7, -4])
    assert A.apply(unary.ainv).new().isequal(result)


def test_apply_binary_bound(A):
    # reference test_matrix.py:1168
    result_right = Matrix.from_coo(
        RIDX, CIDX, [1, 1, 1, 0, 1, 1, 1, 1, 1, 0, 1, 1], dtype=bool)
    assert A.apply(binary.gt, right=1).new().isequal(result_right)
    assert A.apply(binary.gt, right=Scalar.from_value(1)).new() \
        .isequal(result_right)
    result_left = Matrix.from_coo(
        RIDX, CIDX, [5, 6, 5, 7, 3, 5, 1, 0, 5, 7, 1, 4])
    assert A.apply(binary.minus, left=8).new().isequal(result_left)
    assert A.apply(binary.minus, left=Scalar.from_value(8)).new() \
        .isequal(result_left)
    with pytest.raises(TypeError):
        A.apply(binary.plus, left=A)
    with pytest.raises(TypeError):
        A.apply(binary.plus, right=A)
    with pytest.raises(TypeError):
        A.apply(binary.plus, left=1, right=1)
    # monoids allowed
    w1 = A.apply(binary.plus, left=1).new()
    w2 = A.apply(monoid.plus, left=1).new()
    w3 = A.apply(monoid.plus, right=1).new()
    assert w1.isequal(w2)
    assert w1.isequal(w3)


def test_apply_indexunary_spellings(A):
    # reference test_matrix.py:1203
    Ar = Matrix.from_coo(RIDX, CIDX, RIDX)
    assert A.apply("rowindex").new().isequal(Ar)
    assert A.apply(indexunary.rowindex).new().isequal(Ar)
    assert indexunary.rowindex(A).new().isequal(Ar)

    Ac = Matrix.from_coo(RIDX, CIDX, [c + 2 for c in CIDX])
    assert A.apply("colindex", 2).new().isequal(Ac)
    assert A.apply(indexunary.colindex, 2).new().isequal(Ac)
    assert indexunary.colindex(A, thunk=2).new().isequal(Ac)

    A3 = Matrix.from_coo(RIDX, CIDX,
                         [1, 0, 1, 0, 0, 1, 0, 0, 1, 0, 0, 0], dtype=bool)
    s3 = Scalar.from_value(3, dtypes.INT64)
    assert A.apply(indexunary.valueeq, s3).new().isequal(A3)
    assert A.apply(select.valueeq, s3).new().isequal(A3)
    assert A.apply("==", s3).new().isequal(A3)
    assert indexunary.valueeq(A, s3).new().isequal(A3)


def test_indexunary_pickle_identity():
    assert pickle.loads(pickle.dumps(indexunary.tril)) is indexunary.tril


def test_select_matrix_exact(A):
    # reference test_matrix.py:1238
    A3 = Matrix.from_coo([0, 3, 3, 6], [3, 0, 2, 4], [3, 3, 3, 3],
                         nrows=7, ncols=7)
    w1 = A.select(select.valueeq, 3).new()
    w2 = A.select("==", 3).new()
    w3 = select.value(A == 3).new()
    assert w1.isequal(A3)
    assert w2.isequal(A3)
    assert w3.isequal(A3)
    A2 = A.select(select.triu, 1).new()
    r, c, _ = A2.to_coo()
    assert (c.astype(int) >= r.astype(int) + 1).all()
    A4 = A.select("index<=", 2).new()
    r4, _, _ = A4.to_coo()
    assert (r4.astype(int) <= 2).all()


def test_apply_unary_string_and_functional(A):
    w1 = A.apply("ainv").new()
    w2 = unary.ainv(A).new()
    assert w1.isequal(w2)
    # functional semiring application (reference §3.3)
    v = gb.Vector.from_coo([1, 3, 4, 6], [1, 1, 2, 0])
    w3 = gb.semiring.plus_times(v @ A).new()
    w4 = v.vxm(A, gb.semiring.plus_times).new()
    assert w3.isequal(w4)


def test_apply_empty_input():
    # reference test_vector.py:698
    e = gb.Vector(int, 5)
    out = e.apply(unary.ainv).new()
    assert out.nvals == 0
    out2 = e.apply(binary.plus, right=1).new()
    assert out2.nvals == 0
