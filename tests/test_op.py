import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import agg, binary, dtypes, indexunary, monoid, op, select, semiring, unary
from graphblas_tpu.core.operator import BinaryOp, Monoid, Semiring, UnaryOp
from graphblas_tpu.core.operator.utils import get_typed_op


def test_builtin_unary_exist():
    for name in ["identity", "ainv", "minv", "abs", "lnot", "one", "sqrt",
                 "exp", "log", "sin", "floor", "isnan", "isinf"]:
        assert hasattr(unary, name), name
    # ss-relocated
    for name in ["erf", "erfc", "lgamma", "tgamma", "positioni", "positionj1"]:
        assert hasattr(unary.ss, name), name
    with pytest.raises(AttributeError, match="unary.ss"):
        unary.erf


def test_builtin_binary_exist():
    for name in ["first", "second", "plus", "minus", "times", "cdiv", "rdiv",
                 "truediv", "min", "max", "pow", "pair", "any", "lor", "land",
                 "eq", "ne", "gt", "atan2", "floordiv", "absfirst", "binom",
                 "isclose"]:
        assert hasattr(binary, name), name
    for name in ["firsti", "firstj1", "secondi", "secondj"]:
        assert hasattr(binary.ss, name), name


def test_typed_lookup():
    t = binary.plus[dtypes.INT64]
    assert t.type is dtypes.INT64
    assert t.return_type is dtypes.INT64
    assert binary.eq[dtypes.FP64].return_type is dtypes.BOOL
    with pytest.raises(KeyError, match="does not work with"):
        unary.sqrt[dtypes.INT64]
    assert dtypes.INT64 in binary.plus
    assert dtypes.INT64 not in unary.sqrt


def test_monoid_identities():
    assert monoid.plus[dtypes.INT64].identity == 0
    assert monoid.times[dtypes.INT64].identity == 1
    assert monoid.min[dtypes.INT8].identity == 127
    assert monoid.max[dtypes.INT8].identity == -128
    assert monoid.min[dtypes.FP64].identity == np.inf
    assert monoid.lor[dtypes.BOOL].identity is False
    assert monoid.land[dtypes.BOOL].identity is True
    assert monoid.band[dtypes.UINT8].identity == 255
    # coercion aliases add numeric keys that map to the BOOL typed op
    # (reference monoid.py:413-431); identity is defined for BOOL
    assert dtypes.BOOL in set(monoid.lor.identities)
    assert monoid.lor[dtypes.INT64].type == dtypes.BOOL


def test_semiring_lazy_build():
    ring = semiring.min_plus
    assert ring.monoid.name == "min"
    assert ring.binaryop.name == "plus"
    assert semiring.min_plus is ring  # cached
    t = ring[dtypes.INT64]
    assert t.return_type is dtypes.INT64
    assert semiring.plus_pair[dtypes.FP64].return_type is dtypes.FP64
    assert semiring.lor_land[dtypes.BOOL].return_type is dtypes.BOOL
    # positional semirings live under ss
    with pytest.raises(AttributeError, match="semiring.ss"):
        semiring.min_firsti
    assert semiring.ss.min_firsti.is_positional
    with pytest.raises(AttributeError):
        semiring.bogus_name
    with pytest.raises(AttributeError):
        semiring.min_bogus


def test_get_semiring_compose():
    ring = semiring.get_semiring(monoid.plus, binary.plus)
    assert ring.monoid is monoid.plus
    ring2 = semiring.get_semiring(monoid.plus, binary.plus)
    assert ring is ring2


def test_from_string():
    assert unary.from_string("abs") is unary.abs
    assert unary.from_string("-") is unary.ainv
    assert binary.from_string("+") is binary.plus
    t = binary.from_string("+[int]")
    assert t.type is dtypes.INT64
    assert monoid.from_string("*") is monoid.times
    ring = semiring.from_string("min.+")
    assert ring.monoid.name == "min"
    assert ring.binaryop.name == "plus"
    assert semiring.from_string("min_plus") is semiring.min_plus
    assert op.from_string("abs") is unary.abs
    assert select.from_string("<").name == "valuelt"
    with pytest.raises(ValueError):
        binary.from_string("bogus_not_an_op")


def test_register_new_unary():
    op_ = unary.register_new("plus_one_test", lambda x: x + 1)
    assert unary.plus_one_test is op_
    assert dtypes.INT64 in op_
    v = gb.Vector.from_coo([0, 2], [10, 20])
    w = v.apply(op_).new()
    assert w.to_coo()[1].tolist() == [11, 21]


def test_register_new_binary_monoid_semiring():
    bop = binary.register_new("absdiff_test", lambda x, y: abs(x - y))
    mono = monoid.register_new("maxabs_test", bop, 0)
    ring = semiring.register_new("plus_absdiff_test", monoid.plus, bop)
    v = gb.Vector.from_coo([0, 1], [3, -4])
    w = gb.Vector.from_coo([0, 1], [1, 1])
    r = v.ewise_mult(w, bop).new()
    assert r.to_coo()[1].tolist() == [2, 5]
    assert v.inner(w, ring).new().value == 7


def test_parameterized_op():
    def make(n=1):
        def inner(x):
            return x + n

        return inner

    p = unary.register_anonymous(make, parameterized=True)
    op5 = p(n=5)
    v = gb.Vector.from_coo([0], [1])
    assert v.apply(op5).new()[0].new().value == 6
    # default parameters used when passed directly
    assert v.apply(p).new()[0].new().value == 2


def test_commutes_to():
    assert binary.plus.commutes_to is binary.plus
    assert binary.minus.commutes_to is binary.rminus
    assert binary.lt.commutes_to is binary.gt
    assert binary.first.commutes_to is binary.second


def test_binary_monoid_link():
    assert binary.plus.monoid is monoid.plus
    assert binary.minus.monoid is None


def test_int_division_semantics():
    # C-style truncation toward zero (SuiteSparse GB_IDIV semantics)
    v = gb.Vector.from_coo([0, 1, 2], [-7, 7, -7], dtype=dtypes.INT64)
    w = gb.Vector.from_coo([0, 1, 2], [2, -2, -2], dtype=dtypes.INT64)
    r = v.ewise_mult(w, binary.cdiv).new()
    assert r.to_coo()[1].tolist() == [-3, -3, 3]
    # division by zero
    z = gb.Vector.from_coo([0, 1, 2], [0, 5, -5], dtype=dtypes.INT32)
    zero = gb.Vector.from_coo([0, 1, 2], [0, 0, 0], dtype=dtypes.INT32)
    r = z.ewise_mult(zero, binary.cdiv).new()
    assert r.to_coo()[1].tolist() == [0, 2**31 - 1, -(2**31)]


def test_truediv_promotes():
    v = gb.Vector.from_coo([0, 1], [1, 3], dtype=dtypes.INT64)
    w = gb.Vector.from_coo([0, 1], [2, 2], dtype=dtypes.INT64)
    r = v.ewise_mult(w, binary.truediv).new()
    assert r.dtype is dtypes.FP64
    assert r.to_coo()[1].tolist() == [0.5, 1.5]


def test_numpy_namespace():
    assert unary.numpy.exp is not None
    assert binary.numpy.mod is not None
    v = gb.Vector.from_coo([0, 1], [5, -3], dtype=dtypes.INT64)
    w = v.apply(binary.numpy.mod, right=3).new()
    # numpy mod semantics: sign of divisor
    assert w.to_coo()[1].tolist() == [2, 0]


def test_aggregators_exist():
    for name in ["sum", "prod", "all", "any", "min", "max", "count",
                 "count_nonzero", "mean", "varp", "stdp", "L2norm",
                 "logaddexp", "hypot", "peak_to_peak"]:
        assert hasattr(agg, name), name
    for name in ["argmin", "argmax", "first", "last", "first_index"]:
        assert hasattr(agg.ss, name), name
    with pytest.raises(AttributeError, match="agg.ss"):
        agg.argmin


def test_op_namespace_combined():
    assert op.plus is binary.plus
    assert op.abs is unary.abs
    assert op.min_plus is semiring.min_plus
