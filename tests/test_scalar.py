import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Scalar, binary, dtypes, monoid, unary


@pytest.fixture
def s():
    return Scalar.from_value(5)


def test_new():
    s = Scalar(dtypes.INT8)
    assert s.dtype == "INT8"
    assert s.nvals == 0
    assert s.is_empty
    assert s.value is None
    assert s.shape == ()
    assert s.ndim == 0


def test_from_value(s):
    assert s.value == 5
    assert s.dtype == dtypes.INT64
    assert s.nvals == 1
    f = Scalar.from_value(1.5)
    assert f.dtype == dtypes.FP64
    b = Scalar.from_value(True)
    assert b.dtype == dtypes.BOOL
    c = Scalar.from_value(2, dtype="FP32")
    assert c.dtype == dtypes.FP32


def test_cscalar_duality():
    a = Scalar.from_value(3, is_cscalar=True)
    b = Scalar.from_value(3, is_cscalar=False)
    assert a.is_cscalar and not a.is_grbscalar
    assert b.is_grbscalar and not b.is_cscalar
    # both representations behave identically (bizarro-scalar invariant)
    assert a.isequal(b)
    assert (a + 1).new().value == (b + 1).new().value


def test_set_clear(s):
    s.value = 10
    assert s.value == 10
    s.value = None
    assert s.is_empty
    s.value = 3
    s.clear()
    assert s.is_empty


def test_dup(s):
    d = s.dup()
    assert d.value == 5
    s.value = 9
    assert d.value == 5
    f = s.dup(dtype="FP64")
    assert f.dtype == dtypes.FP64
    e = s.dup(clear=True)
    assert e.is_empty


def test_isequal_isclose(s):
    assert s.isequal(Scalar.from_value(5))
    assert s.isequal(5)
    assert not s.isequal(6)
    assert not s.isequal(None)
    empty = Scalar(dtypes.INT64)
    assert empty.isequal(None)
    assert not empty.isequal(5)
    f = Scalar.from_value(1.0)
    assert f.isclose(1.0 + 1e-9)
    assert not f.isclose(1.1)


def test_conversions(s):
    assert int(s) == 5
    assert float(s) == 5.0
    assert bool(s)
    assert s.__index__() == 5
    assert not bool(Scalar.from_value(0))
    assert not bool(Scalar(dtypes.INT64))
    arr = np.asarray(s)
    assert arr.dtype == np.int64 and arr[()] == 5


def test_ewise(s):
    t = Scalar.from_value(3)
    assert s.ewise_add(t, binary.plus).new().value == 8
    assert s.ewise_mult(t, binary.times).new().value == 15
    empty = Scalar(dtypes.INT64)
    assert s.ewise_add(empty, binary.plus).new().value == 5
    assert s.ewise_mult(empty, binary.times).new().value is None
    assert s.ewise_union(empty, binary.plus, 0, 100).new().value == 105


def test_apply(s):
    assert s.apply(unary.ainv).new().value == -5
    assert s.apply(binary.plus, right=2).new().value == 7
    assert s.apply(binary.minus, left=2).new().value == -3


def test_update(s):
    s << 7
    assert s.value == 7
    s(accum=binary.plus) << 3
    assert s.value == 10
    t = Scalar.from_value(1)
    s << t
    assert s.value == 1


def test_update_from_reduce(s):
    v = gb.Vector.from_coo([0, 1], [2, 3])
    s << v.reduce(monoid.plus)
    assert s.value == 5
    s(accum=binary.plus) << v.reduce(monoid.plus)
    assert s.value == 10


def test_infix(s):
    t = Scalar.from_value(3)
    assert (s + t).new().value == 8
    assert (s * 2).new().value == 10
    assert (s == 5)
    assert not (s == 6)
    assert (s > t)


def test_get(s):
    assert s.get() == 5
    assert Scalar(dtypes.INT64).get(42) == 42


def test_pickle(s):
    import pickle

    t = pickle.loads(pickle.dumps(s))
    assert t.isequal(s)
    assert t.dtype == s.dtype
    empty = Scalar(dtypes.FP32, is_cscalar=True)
    e2 = pickle.loads(pickle.dumps(empty))
    assert e2.is_empty and e2.is_cscalar


def test_repr(s):
    assert "5" in repr(s)
    assert "INT64" in repr(s)


def test_wait(s):
    assert s.wait() is s


def test_unsupported_ops(s):
    # reference test_scalar.py:203
    with pytest.raises(AttributeError):
        s.S
    with pytest.raises(AttributeError):
        s.V
    with pytest.raises(AttributeError):
        s.T
    with pytest.raises(TypeError):
        s[0]
    with pytest.raises(TypeError):
        s[0] = 0
    with pytest.raises(TypeError):
        del s[0]


def test_update_protocol_errors(s):
    # reference test_scalar.py:223
    s << 1
    assert s == 1
    s << gb.Scalar.from_value(2)
    assert s == 2
    s() << 5
    assert s == 5
    s(accum=gb.binary.plus) << 6
    assert s == 11
    with pytest.raises(TypeError):
        s(s)
    with pytest.raises(TypeError):
        s(input_mask=s)
    with pytest.raises(TypeError):
        s(replace=True)


def test_ewise_union_empty_propagation(s):
    # reference test_scalar.py:519 — empty scalars propagate through
    # ewise_union defaults; an empty default raises EmptyObject
    from graphblas_tpu.exceptions import EmptyObject

    t = gb.Scalar(int)
    result = s.ewise_union(t, gb.binary.plus, 10, 20).new()
    assert result == 25
    with pytest.raises(EmptyObject):
        s.ewise_union(t, gb.binary.plus, 10, t).new()
    result = s.ewise_union(s, gb.monoid.plus, 10, 20).new()
    assert result == 10
    result = t.ewise_union(t, gb.binary.plus, 10, 20).new()
    assert result.is_empty


def test_ewise_mult_add_values(s):
    # reference test_scalar.py:540
    assert s.ewise_add(s).new() == 10
    assert s.ewise_mult(s).new() == 25


def test_scalar_select(s):
    # reference test_scalar.py:550
    from graphblas_tpu import select

    assert select.value(s < 10).new() == s
    assert select.value(s > 10).new().is_empty
    assert select.valueeq(s, 5).new() == s
    assert select.valuene(5, s).new().is_empty


def test_not_hashable(s):
    with pytest.raises(TypeError):
        hash(s)


def test_neg_invert():
    # reference test_scalar.py:286,312
    s = gb.Scalar.from_value(5)
    assert (-s).new() == -5 or (-s) == -5
    e = gb.Scalar(int)
    neg = -e
    val = neg.new() if hasattr(neg, "new") else neg
    assert val.is_empty
    b = gb.Scalar.from_value(True)
    inv = ~b
    val = inv.new() if hasattr(inv, "new") else inv
    assert val == False  # noqa: E712


def test_casting():
    # reference test_scalar.py:129
    s = gb.Scalar.from_value(5)
    assert int(s) == 5
    assert isinstance(int(s), int)
    assert float(s) == 5.0
    assert range(s) == range(5)
    f = gb.Scalar.from_value(2.5)
    assert float(f) == 2.5
    assert int(f) == 2


def test_truthy_empty():
    # reference test_scalar.py:141
    assert bool(gb.Scalar.from_value(5))
    assert not bool(gb.Scalar.from_value(0))
    assert not bool(gb.Scalar(int))
    assert bool(gb.Scalar.from_value(True))
    assert not bool(gb.Scalar.from_value(False))


def test_nvals_scalar(s):
    # reference test_scalar.py:197
    assert s.nvals == 1
    s.clear()
    assert s.nvals == 0
