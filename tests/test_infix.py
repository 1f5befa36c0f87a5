"""Infix expression machinery (reference tests/test_infix.py)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Scalar, Vector, binary, dtypes, monoid, semiring

from .helpers import make_A, make_v


def test_ewise_infix_classes():
    v = make_v()
    expr = v | v
    assert expr.method_name == "ewise_add"
    assert expr.shape == (7,)
    expr2 = v & v
    assert expr2.method_name == "ewise_mult"
    A = make_A()
    e3 = A | A
    assert e3.shape == (7, 7)
    assert e3.output_type is Matrix


def test_matmul_infix_classes():
    A = make_A()
    v = make_v()
    assert (A @ v).method_name == "mxv"
    assert (v @ A).method_name == "vxm"
    assert (A @ A).method_name == "mxm"
    assert (v @ v).method_name == "inner"
    assert (v @ v).output_type is Scalar


def test_functional_application():
    A = make_A()
    v = make_v()
    r1 = semiring.min_plus(v @ A).new()
    assert r1.isequal(v.vxm(A, semiring.min_plus).new())
    r2 = monoid.plus(v | v).new()
    assert r2.isequal(v.ewise_add(v, binary.plus).new())
    r3 = binary.times(v & v).new()
    assert r3.isequal(v.ewise_mult(v, binary.times).new())
    with pytest.raises(TypeError):
        semiring.min_plus(v | v)
    with pytest.raises(TypeError):
        binary.plus(v @ A)


def test_bool_auto_infix():
    b = (make_v() > 0).new()
    r = (b | b).new()
    assert r.dtype == dtypes.BOOL
    r2 = (b & b).new()
    assert r2.nvals == 4
    with pytest.raises(TypeError, match="BOOL"):
        (make_v() | make_v()).new()


def test_infix_updates_target():
    v = make_v()
    out = Vector(dtypes.INT64, 7)
    out << monoid.plus(v | v)
    assert out.to_dict() == {1: 2, 3: 2, 4: 4, 6: 0}
    out2 = Vector(dtypes.INT64, 7)
    out2 << binary.plus(v, 5)
    assert out2.to_dict() == {1: 6, 3: 6, 4: 7, 6: 5}


def test_matmul_shape_validation():
    A = make_A()
    w = Vector(dtypes.INT64, 3)
    from graphblas_tpu.exceptions import DimensionMismatch

    with pytest.raises(DimensionMismatch):
        A @ w
    with pytest.raises(TypeError):
        A @ 5


def test_scalar_infix_expressions():
    s = Scalar.from_value(5)
    t = Scalar.from_value(3)
    e = s | t
    assert e._is_scalar
    r = monoid.plus(s | t).new()
    assert r.value == 8
    r2 = binary.times(s & t).new()
    assert r2.value == 15


def test_dunder_arithmetic_matrix_vector():
    A = make_A()
    v = make_v()
    # matrix op vector broadcasts (reference _m_mult_v)
    C = (A * v).new()
    assert C[0, 1].new().value == 2 * 1
    # division promotes
    D = (A / 2).new()
    assert D.dtype == dtypes.FP64
    assert D[6, 3].new().value == 3.5
    # floordiv
    E = (A // 2).new()
    assert E[6, 3].new().value == 3
    # power
    F = (v ** 2).new()
    assert F.to_dict() == {1: 1, 3: 1, 4: 4, 6: 0}
    # mod
    G = (v % 2).new()
    assert G.to_dict() == {1: 1, 3: 1, 4: 0, 6: 0}
    # unary
    H = (-v).new()
    assert H.to_dict() == {1: -1, 3: -1, 4: -2, 6: 0}
    K = abs((-v).new()).new()
    assert K.to_dict() == {1: 1, 3: 1, 4: 2, 6: 0}


def test_comparison_infix():
    v = make_v()
    r = (v == 1).new()
    assert r.dtype == dtypes.BOOL
    assert r.to_dict() == {1: True, 3: True, 4: False, 6: False}
    r2 = (v != v).new()
    assert set(r2.to_coo()[1].tolist()) == {False}


def test_inplace_operators():
    v = make_v()
    v += 1
    assert v.to_dict() == {1: 2, 3: 2, 4: 3, 6: 1}
    v *= 2
    assert v.to_dict() == {1: 4, 3: 4, 4: 6, 6: 2}
    v -= v.dup()
    assert set(v.to_coo()[1].tolist()) == {0}
