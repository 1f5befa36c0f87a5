"""Vector assign / subassign case analysis.

Expected values verbatim from the reference suite
(graphblas/tests/test_vector.py:503-663); v is the fixture vector
{1: 1, 3: 1, 4: 2, 6: 0} of size 7.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary
from graphblas_tpu.exceptions import DimensionMismatch

from .helpers import make_A, make_v

Vector = gb.Vector
Scalar = gb.Scalar


@pytest.fixture
def v():
    return make_v()


def test_assign_vector_value(v):
    # reference test_vector.py:503
    u = Vector.from_coo([0, 2], [9, 8])
    result = Vector.from_coo([0, 1, 3, 4, 6], [9, 1, 1, 8, 0])
    w = v.dup()
    w[[0, 2, 4]] = u
    assert w.isequal(result)
    w = v.dup()
    w[:5:2] << u
    assert w.isequal(result)
    with pytest.raises(TypeError):
        w[w] = 1


def test_assign_scalar_value(v):
    # reference test_vector.py:518
    result = Vector.from_coo([1, 3, 4, 5, 6], [9, 9, 2, 9, 0])
    w = v.dup()
    w[[1, 3, 5]] = 9
    assert w.isequal(result)
    w = v.dup()
    w[1::2] = 9
    assert w.isequal(result)
    w = Vector.from_coo([0, 1, 2], [1, 1, 1])
    s = Scalar.from_value(9)
    w[0] = s
    assert w.isequal(Vector.from_coo([0, 1, 2], [9, 1, 1]))
    w[:] = s
    assert w.isequal(Vector.from_coo([0, 1, 2], [9, 9, 9]))
    with pytest.raises(TypeError):
        w[:] = object()
    with pytest.raises(TypeError):
        w[1] = object()
    w << 2
    assert w.isequal(Vector.from_coo([0, 1, 2], [2, 2, 2]))
    w[0] = Scalar(int)
    assert w.isequal(Vector.from_coo([1, 2], [2, 2]))


def test_assign_scalar_all_mask_kinds(v):
    # reference test_vector.py:542 — the three equivalent spellings per kind
    mask = Vector.from_coo([1, 2, 5, 6], [0, 0, 1, 0])
    cases = [
        (mask.V, Vector.from_coo([1, 3, 4, 5, 6], [1, 1, 2, 5, 0])),
        (~mask.V, Vector.from_coo([0, 1, 2, 3, 4, 6], [5, 5, 5, 5, 5, 5])),
        (mask.S, Vector.from_coo([1, 2, 3, 4, 5, 6], [5, 5, 1, 2, 5, 5])),
        (~mask.S, Vector.from_coo([0, 1, 3, 4, 6], [5, 1, 5, 5, 0])),
    ]
    for m, result in cases:
        w = v.dup()
        w[:](m) << 5
        assert w.isequal(result), repr(m)
        w = v.dup()
        w(m) << 5
        assert w.isequal(result), repr(m)
        w = v.dup()
        w(m)[:] << 5
        assert w.isequal(result), repr(m)


def test_subassign_vector():
    # reference test_vector.py:586
    A = make_A()
    v = Vector.from_coo([0, 1, 2], [0, 1, 2])
    w = Vector.from_coo([0, 1], [10, 20])
    m = Vector.from_coo([1], [True])
    v[[0, 1]](m.S) << w
    assert v.isequal(Vector.from_coo([0, 1, 2], [0, 20, 2]))
    with pytest.raises(DimensionMismatch):
        v[[0, 1]](v.S) << w
    with pytest.raises(DimensionMismatch):
        v[[0, 1]](m.S) << v

    v[[0, 1]](m.S) << 100
    assert v.isequal(Vector.from_coo([0, 1, 2], [0, 100, 2]))
    with pytest.raises(DimensionMismatch):
        v[[0, 1]](v.S) << 99
    with pytest.raises(TypeError):
        v[[0, 1]](A.S) << 88
    with pytest.raises(TypeError):
        v[[0, 1]](A.S) << w


def test_assign_scalar_with_mask_and_submask():
    # reference test_vector.py:614
    v = Vector.from_coo([0, 1, 2], [1, 2, 3])
    m = Vector.from_coo([0, 2], [False, True])
    w1 = Vector.from_coo([0], [50])
    w3 = Vector.from_coo([0, 1, 2], [10, 20, 30])

    v(m.V)[:] << w3
    assert v.isequal(Vector.from_coo([0, 1, 2], [1, 2, 30]))

    v(m.V)[:] << 100
    assert v.isequal(Vector.from_coo([0, 1, 2], [1, 2, 100]))

    v(m.V, accum=binary.plus)[2] << 1000
    assert v.isequal(Vector.from_coo([0, 1, 2], [1, 2, 1100]))

    with pytest.raises(TypeError):
        v[2](w1.S) << w1
    with pytest.raises(TypeError):
        v[2](w1.S) << 7

    v[[2]](w1.S) << 7
    assert v.isequal(Vector.from_coo([0, 1, 2], [1, 2, 7]))


def test_assign_list_values():
    # reference test_vector.py:643
    v = Vector(int, 4)
    v[[0, 1]] = [2, 3]
    assert v.isequal(Vector.from_coo([0, 1], [2, 3], size=4))
    v[::2] = np.arange(2)
    assert v.isequal(Vector.from_coo([0, 1, 2], [0, 3, 1], size=4))
    with pytest.raises((TypeError, ValueError)):
        v[0] = [1]
    with pytest.raises((TypeError, ValueError, DimensionMismatch)):
        v[[0, 1]] = [1, 2, 3]


def test_del_vector_element(v):
    # reference test_vector.py:288
    assert v[1].new().value == 1
    del v[1]
    assert v[1].new().is_empty
    assert v.nvals == 3
    del v[3:5]  # range delete
    assert v.nvals == 1


def test_select_spellings(v):
    # reference test_vector.py:729 — every select spelling agrees
    from graphblas_tpu import select

    result = Vector.from_coo([1, 3], [1, 1], size=7)
    w1 = v.select(select.valueeq, 1).new()
    w2 = v.select("==", 1).new()
    w3 = select.rowle(v, 3).new()
    w4 = v.select("index<=", 3).new()
    w5 = select.value(v == 1).new()
    w6 = select.index(v < 4).new()
    for w in (w1, w2, w3, w4, w5, w6):
        assert w.isequal(result)
    w8 = select.index(v >= 4).new()
    assert w8.isequal(Vector.from_coo([4, 6], [2, 0], size=7))


def test_select_masks_as_op(v):
    # reference test_vector.py:754 — masks usable as select "op"
    result = Vector.from_coo([1, 3], [1, 1], size=7)
    w7 = v.select(v == 1).new()
    assert w7.isequal(result)
    w8 = v.select(w7.S).new()
    assert w8.isequal(result)
    w7b = w7.dup()
    w7b[4] = 0
    w9 = v.select(w7b.V).new()
    assert w9.isequal(result)


def test_vxm_mask_variants(v):
    # reference test_vector.py:323 — masked vxm across mask kinds, exact
    # expected values from the reference test
    A = make_A()
    val_mask = Vector.from_coo([0, 1, 2, 3, 4],
                               [True, False, False, True, True], size=7)
    struct_mask = Vector.from_coo([0, 3, 4], [False, False, False], size=7)
    u = v.dup()
    u(struct_mask.S) << v.vxm(A, gb.semiring.plus_times)
    result = Vector.from_coo([0, 1, 3, 4, 6], [3, 1, 0, 8, 0], size=7)
    assert u.isequal(result)
    u = v.dup()
    u(~struct_mask.S) << v.vxm(A, gb.semiring.plus_times)
    result2 = Vector.from_coo([2, 3, 4, 5, 6], [3, 1, 2, 14, 4], size=7)
    assert u.isequal(result2)
    u = v.dup()
    u(replace=True, mask=val_mask.V) << v.vxm(A, gb.semiring.plus_times)
    result3 = Vector.from_coo([0, 3, 4], [3, 0, 8], size=7)
    assert u.isequal(result3)
    w = v.vxm(A, gb.semiring.plus_times).new(mask=val_mask.V)
    assert w.isequal(result3)


def test_vxm_accum(v):
    # reference test_vector.py:348 — accum as BinaryOp, Monoid, and string
    A = make_A()
    result = Vector.from_coo([0, 1, 2, 3, 4, 5, 6],
                             [3, 1, 3, 1, 10, 14, 4], size=7)
    w = v.dup()
    w(binary.plus) << v.vxm(A, gb.semiring.plus_times)
    assert w.isequal(result)
    w2 = v.dup()
    w2(gb.monoid.plus) << v.vxm(A, gb.semiring.plus_times)
    assert w2.isequal(result)
    w3 = v.dup()
    w3(accum="plus") << v.vxm(A, gb.semiring.plus_times)
    assert w3.isequal(result)


def test_reduce_vector(v):
    # reference test_vector.py:864
    s = v.reduce(gb.monoid.plus).new()
    assert s.value == 4
    assert v.reduce(gb.monoid.max).new().value == 2
    # empty reduce
    e = Vector(int, 5)
    assert e.reduce(gb.monoid.plus).new().is_empty
    assert e.reduce(gb.monoid.plus, allow_empty=False).new().value == 0
    # dtype coercion (reference test_vector.py:1009)
    s2 = v.reduce(gb.monoid.plus).new(dtype=gb.dtypes.FP64)
    assert s2.dtype == gb.dtypes.FP64
    assert s2.value == 4.0
