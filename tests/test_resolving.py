"""Ambiguous assign-or-extract + update-protocol semantics
(reference tests/test_resolving.py)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import Vector, binary, dtypes

from .helpers import make_A, make_v


def test_extract_context(make=make_v):
    v = make()
    aae = v[[1, 3]]
    # value context: extract
    r = aae.new()
    assert r.size == 2
    assert r.to_dict() == {0: 1, 1: 1}
    # dup is an alias of new
    assert aae.dup().isequal(r)


def test_assign_context():
    v = make_v()
    v[[1, 3]] << Vector.from_coo([0, 1], [7, 8], size=2)
    assert v.to_dict()[1] == 7 and v.to_dict()[3] == 8


def test_update_into_collection_extract():
    v = make_v()
    out = Vector(dtypes.INT64, 2)
    out << v[[1, 4]]
    assert out.to_dict() == {0: 1, 1: 2}
    out2 = Vector(dtypes.INT64, 2)
    out2(accum=binary.plus) << v[[1, 4]]
    out2(accum=binary.plus) << v[[1, 4]]
    assert out2.to_dict() == {0: 2, 1: 4}


def test_autocompute_on_aae():
    v = make_v()
    assert v[[1, 3]].nvals == 2
    assert v[4].new().value == 2
    assert int(v[4]) == 2
    assert v[4] == 2
    assert v[0].new().value is None


def test_masked_extract():
    v = make_v()
    m = Vector.from_coo([0], [True], size=2)
    r = v[[1, 3]].new(mask=m.S)
    assert r.to_dict() == {0: 1}


def test_single_element_fast_paths():
    A = make_A()
    s = A[6, 3].new()
    assert s.value == 7
    A[6, 3] = 9
    assert A[6, 3].new().value == 9
    # scalar-valued new with dtype
    s2 = A[6, 3].new(dtype="FP64")
    assert s2.dtype == dtypes.FP64 and s2.value == 9.0


def test_updater_getitem_assign():
    # C(mask)[idx] << value: mask in C-space
    v = make_v()
    m = Vector.from_coo([1], [True], size=7)
    v(m.S)[[1, 3]] = 50
    assert v.to_dict()[1] == 50
    assert v.to_dict()[3] == 1  # masked out (mask false at 3)


def test_input_mask_restricted_to_extract():
    v = make_v()
    m = Vector.from_coo([1], [True], size=7)
    with pytest.raises(TypeError, match="input_mask"):
        v(input_mask=m.S) << v.ewise_add(v, binary.plus)
    r = Vector(dtypes.INT64, 7)
    r(input_mask=m.S) << v[:]
    assert r.to_dict() == {1: 1}


def test_mask_and_input_mask_conflict():
    v = make_v()
    m = Vector.from_coo([1], [True], size=7)
    with pytest.raises(TypeError, match="both"):
        v(mask=m.S, input_mask=m.S)


def test_expression_as_value_in_assign():
    v = make_v()
    v[[0, 1]] = (v[[1, 3]] + 10).new()
    assert v.to_dict()[0] == 11 and v.to_dict()[1] == 11


def test_per_call_opts_validation():
    """Per-call descriptor opts are validated (VERDICT r2 #8; reference
    core/ss/descriptor.py:123-197)."""
    import pytest

    import graphblas_tpu as gb

    v = gb.Vector.from_coo([0, 2], [1, 2], size=5)
    w = gb.Vector.from_coo([0, 1], [10, 20], size=5)
    # accepted hint opts are no-ops
    out = gb.Vector(gb.dtypes.INT64, 5)
    out(nthreads=4) << v.ewise_mult(w, gb.binary.plus)
    out(axb_method="hash") << v.ewise_mult(w, gb.binary.plus)
    res = v.ewise_add(w, gb.binary.plus).new(sort=True)
    assert res.nvals == 3
    with pytest.raises(ValueError, match="not understood"):
        v(bogus_opt=1) << v.ewise_mult(w, gb.binary.plus)
    with pytest.raises(ValueError, match="axb_method"):
        v(axb_method="warp") << v.ewise_mult(w, gb.binary.plus)
    with pytest.raises(ValueError, match="not understood"):
        v.ewise_add(w, gb.binary.plus).new(bad_opt=2)


def test_lshift_returns_none():
    """`C << expr` is a statement (reference base.py behavior)."""
    import graphblas_tpu as gb

    v = gb.Vector.from_coo([0, 2], [1, 2], size=5)
    w = gb.Vector(gb.dtypes.INT64, 5)
    assert (w << v.apply(gb.unary.identity)) is None
    assert w.isequal(v)


def test_order_of_updater_params():
    # reference test_resolving.py:43 — every argument order agrees
    u = gb.Vector.from_coo([0, 1, 3], [1, 2, 3])
    mask = gb.Vector.from_coo([0, 3], [True, True])
    accum = gb.binary.plus
    result = gb.Vector.from_coo([0, 3], [5, 10])
    expr = u.ewise_mult(u, gb.binary.times)
    for build in [
        lambda v: v(mask.V, accum, replace=True),
        lambda v: v(accum, mask.V, replace=True),
        lambda v: v(accum, mask=mask.V, replace=True),
        lambda v: v(mask.V, accum=accum, replace=True),
        lambda v: v(replace=True, mask=mask.V, accum=accum),
        lambda v: v(gb.replace, mask=mask.V, accum=accum),
    ]:
        v = gb.Vector.from_coo([0, 1, 2, 3], [4, 3, 2, 1])
        build(v) << u.ewise_mult(u, gb.binary.times)
        assert v.isequal(result)


def test_replace_requires_mask():
    # reference test_resolving.py:74
    u = gb.Vector.from_coo([0, 1, 2], [1, 2, 3])
    with pytest.raises(TypeError):
        u(replace=True)
    with pytest.raises(TypeError):
        u(gb.replace)


def test_replace_repr():
    assert repr(gb.replace) == "replace"
    assert str(gb.replace) == "replace"


def test_updater_repeat_argument_types():
    # reference test_resolving.py:91
    mask = gb.Vector.from_coo([0, 3], [True, True])
    accum = gb.binary.plus
    v = gb.Vector.from_coo([0, 1, 2, 3], [4, 3, 2, 1])
    with pytest.raises(TypeError):
        v(mask.S, mask.S)
    with pytest.raises(TypeError):
        v(mask.S, mask=mask.S)
    with pytest.raises(TypeError):
        v(accum, accum)
    with pytest.raises(TypeError):
        v(accum, accum=accum)


def test_updater_bad_types():
    # reference test_resolving.py:105
    v = gb.Vector.from_coo([0, 1, 2, 3], [4, 3, 2, 1])
    with pytest.raises(TypeError):
        v(mask=object())
    with pytest.raises(TypeError):
        v(object())
    with pytest.raises(TypeError):
        v(gb.unary.one)


def test_typed_ops_in_updater():
    # reference test_resolving.py:120
    u = gb.Vector.from_coo([0, 1, 3], [1, 2, 3])
    u(gb.binary.plus["INT64"]) << u.ewise_mult(u, gb.binary.times["INT64"])
    assert u.isequal(gb.Vector.from_coo([0, 1, 3], [2, 6, 12]))


def test_updater_returns_updater():
    # reference test_resolving.py:128
    from graphblas_tpu.core.expr import Updater

    u = gb.Vector.from_coo([0, 1, 3], [1, 2, 3])
    y = u(accum=gb.binary.times)
    assert isinstance(y, Updater)
    z = y << u.apply(gb.unary.ainv)
    assert z is None
    assert u.isequal(gb.Vector.from_coo([0, 1, 3], [-1, -4, -9]))


def test_resolve_ops_using_common_dtype():
    # reference test_resolving.py:33
    u = gb.Vector.from_coo([0, 1, 3], [1, 2, 3], dtype=gb.dtypes.INT64)
    w = gb.Vector.from_coo([0, 1, 3], [1.0, 2.0, 3.0])
    result = u.ewise_mult(w, gb.binary.plus).new()
    assert result.dtype == gb.dtypes.FP64
    assert result.isequal(gb.Vector.from_coo([0, 1, 3], [2.0, 4.0, 6.0]))
