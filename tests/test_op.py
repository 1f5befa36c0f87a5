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
    # float-family unaries accept int inputs by "sane coercion"
    # (reference core/operator/unary.py _initialize: INT64 -> FP64)
    assert unary.sqrt[dtypes.INT64].return_type is dtypes.FP64
    assert dtypes.INT64 in binary.plus
    assert dtypes.INT64 in unary.sqrt
    with pytest.raises(KeyError, match="does not work with"):
        unary.bnot[dtypes.FP64]


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


def test_unaryop_parameterized_full():
    # reference test_op.py:233
    def plus_x(x=0):
        def inner(val):
            return val + x

        return inner

    op = gb.core.operator.unary.UnaryOp.register_anonymous(
        plus_x, parameterized=True)
    v = gb.Vector.from_coo([0, 1, 3], [1, 2, -4], dtype=dtypes.INT32)
    v0 = v.apply(op).new()
    assert v.isequal(v0, check_dtype=True)
    v0 = v.apply(op(0)).new()
    assert v.isequal(v0, check_dtype=True)
    v10 = v.apply(op(x=10)).new()
    r10 = gb.Vector.from_coo([0, 1, 3], [11, 12, 6], dtype=dtypes.INT32)
    assert r10.isequal(v10, check_dtype=True)


def test_binaryop_parameterized_full():
    # reference test_op.py:259
    def plus_plus_x(x=0):
        def inner(left, right):
            return left + right + x

        return inner

    op = binary.register_anonymous(plus_plus_x, parameterized=True)
    v = gb.Vector.from_coo([0, 1, 3], [1, 2, -4], dtype=dtypes.INT32)
    v0 = v.ewise_mult(v, op).new()
    r0 = gb.Vector.from_coo([0, 1, 3], [2, 4, -8], dtype=dtypes.INT32)
    assert v0.isequal(r0, check_dtype=True)
    v1 = v.ewise_add(v, op(1)).new()
    r1 = gb.Vector.from_coo([0, 1, 3], [3, 5, -7], dtype=dtypes.INT32)
    assert v1.isequal(r1, check_dtype=True)
    # accum with a parameterized op
    v(op) << v
    assert v.isequal(r0)
    v11 = v.apply(op(1), left=10).new()
    # v is now r0: 10 + r0 + 1
    r11 = gb.Vector.from_coo([0, 1, 3], [13, 15, 3])
    assert v11.isequal(r11, check_dtype=False)


def test_monoid_and_semiring_parameterized():
    # reference test_op.py:321/417 (abbreviated to the core behavior)
    def plus_plus_x(x=0):
        def inner(left, right):
            return left + right + x

        return inner

    def identity_x(x=0):
        return -x

    bin_op = binary.register_anonymous(plus_plus_x, parameterized=True)
    mono = gb.core.operator.monoid.Monoid.register_anonymous(
        bin_op, identity_x, name="plus_plus_x_monoid")
    v = gb.Vector.from_coo([0, 1, 3], [1, 2, -4], dtype=dtypes.INT64)
    assert v.reduce(mono(0)).new().value == -1
    assert v.reduce(mono(1)).new().value == 1  # 1+2+1 + (-4) + 1
    ring = gb.core.operator.semiring.Semiring.register_anonymous(
        mono, binary.times, name="plus_plus_x_times")
    A = gb.Matrix.from_coo([0, 0], [0, 1], [2, 3], nrows=2, ncols=2)
    u = gb.Vector.from_coo([0, 1], [5, 7])
    got = A.mxv(u, ring(0)).new()
    assert got[0].new().value == 2 * 5 + 3 * 7


def test_get_semiring_caches():
    # reference test_op.py:969
    from graphblas_tpu.core.operator.utils import get_semiring

    ring1 = get_semiring(gb.monoid.plus, binary.times)
    ring2 = get_semiring(gb.monoid.plus, binary.times)
    assert ring1 is ring2
    assert ring1.monoid is gb.monoid.plus or ring1.monoid.name == "plus"


def test_commutes_tables():
    # reference test_op.py:1026/1362 — commutation self-consistency
    for name in ["plus", "times", "min", "max", "lor", "land", "eq", "ne"]:
        op = getattr(binary, name)
        assert op.commutes_to is op or op.commutes_to.name == name
    assert binary.lt.commutes_to.name == "gt"
    assert binary.gt.commutes_to.name == "lt"
    assert binary.le.commutes_to.name == "ge"
    assert binary.first.commutes_to.name == "second"
    assert binary.minus.commutes_to.name == "rminus"
    assert binary.cdiv.commutes_to.name == "rdiv"


def test_positional_ops():
    # reference test_op.py:1193
    A = gb.Matrix.from_coo([0, 1, 2], [2, 0, 1], [9, 9, 9], nrows=3, ncols=3)
    r = A.apply(gb.indexunary.rowindex).new()
    rr, cc, vv = r.to_coo()
    np.testing.assert_array_equal(vv, rr.astype(np.int64))
    c = A.apply(gb.indexunary.colindex).new()
    rr, cc, vv = c.to_coo()
    np.testing.assert_array_equal(vv, cc.astype(np.int64))
    # positional semiring multiply
    u = gb.Vector.from_coo([0, 1, 2], [1, 1, 1])
    got = A.mxv(u, gb.semiring.ss.min_secondi).new()
    rr2, vv2 = got.to_coo()
    exp = [2, 0, 1]  # the k index of each row's single edge
    np.testing.assert_array_equal(vv2, exp)


def test_is_idempotent():
    # reference test_op.py:1437
    assert gb.monoid.min.is_idempotent
    assert gb.monoid.max.is_idempotent
    assert gb.monoid.lor.is_idempotent
    assert gb.monoid.band.is_idempotent
    assert not gb.monoid.plus.is_idempotent
    assert not gb.monoid.times.is_idempotent


def test_dir_namespaces():
    # reference test_op.py:1340 — dir() exposes lazy-loaded names
    assert "plus" in dir(binary)
    assert "min_plus" in dir(gb.semiring)
    assert "sqrt" in dir(gb.unary)
    assert "numpy" in dir(binary)
    assert "exp" in dir(gb.unary.numpy) or "exp" in dir(gb.monoid.numpy)
