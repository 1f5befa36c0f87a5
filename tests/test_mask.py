import itertools

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes

from .helpers import make_v


def _mask_of(v, kind):
    return {
        "S": v.S,
        "V": v.V,
        "~S": ~v.S,
        "~V": ~v.V,
    }[kind]


def _expected_write_set(vals, ok, kind):
    if kind == "S":
        return ok
    if kind == "V":
        return ok & (vals != 0)
    if kind == "~S":
        return ~ok
    return ~(ok & (vals != 0))


KINDS = ["S", "V", "~S", "~V"]


@pytest.mark.parametrize("kind", KINDS)
def test_mask_write_semantics(kind):
    v = make_v()  # {1:1, 3:1, 4:2, 6:0}
    vals, ok = v._host_arrays()
    out = gb.Vector(dtypes.INT64, 7)
    out(_mask_of(v, kind)) << gb.Vector.from_scalar(9, 7)
    exp = _expected_write_set(np.asarray(vals), np.asarray(ok), kind)
    _, got_ok = out._host_arrays()
    np.testing.assert_array_equal(np.asarray(got_ok), exp)


@pytest.mark.parametrize("kind", KINDS)
def test_mask_new(kind):
    v = make_v()
    vals, ok = v._host_arrays()
    m = _mask_of(v, kind).new()
    exp = _expected_write_set(np.asarray(vals), np.asarray(ok), kind)
    _, got_ok = m._host_arrays()
    np.testing.assert_array_equal(np.asarray(got_ok), exp)
    assert m.dtype == dtypes.BOOL
    got_vals, _ = m._host_arrays()
    assert np.asarray(got_vals)[np.asarray(got_ok)].all()


@pytest.mark.parametrize("k1,k2", list(itertools.product(KINDS, KINDS)))
def test_mask_combine_and_or(k1, k2):
    v = make_v()
    w = gb.Vector.from_coo([0, 1, 4], [0, 5, 6], size=7)
    vv, vo = (np.asarray(x) for x in v._host_arrays())
    wv, wo = (np.asarray(x) for x in w._host_arrays())
    e1 = _expected_write_set(vv, vo, k1)
    e2 = _expected_write_set(wv, wo, k2)
    m_and = (_mask_of(v, k1) & _mask_of(w, k2)).new()
    _, got = m_and._host_arrays()
    np.testing.assert_array_equal(np.asarray(got), e1 & e2)
    m_or = (_mask_of(v, k1) | _mask_of(w, k2)).new()
    _, got = m_or._host_arrays()
    np.testing.assert_array_equal(np.asarray(got), e1 | e2)


def test_mask_new_complement():
    v = make_v()
    m = v.S.new(complement=True)
    _, got = m._host_arrays()
    _, ok = v._host_arrays()
    np.testing.assert_array_equal(np.asarray(got), ~np.asarray(ok))


def test_mask_errors():
    v = make_v()
    with pytest.raises(TypeError):
        bool(v.S)
    with pytest.raises(TypeError):
        v.S == v.S
    w = gb.Vector(dtypes.BOOL, 3)
    from graphblas_tpu.exceptions import DimensionMismatch

    with pytest.raises(DimensionMismatch):
        (v.S & w.S)


def test_mask_repr():
    v = make_v()
    v.name = "v"
    assert repr(v.S).startswith('"v.S"')
    assert "StructuralMask" in repr(v.S)
    assert repr(~v.V).startswith('"~v.V"')
    assert "ComplementedValueMask" in repr(~v.V)


def test_matrix_masks():
    A = gb.Matrix.from_coo([0, 1], [1, 0], [1, 0], nrows=2, ncols=2)
    out = gb.Matrix(dtypes.INT64, 2, 2)
    out(A.V) << gb.Matrix.from_scalar(5, 2, 2)
    assert out.to_dicts() == {0: {1: 5}}
    out2 = gb.Matrix(dtypes.INT64, 2, 2)
    out2(~A.S) << gb.Matrix.from_scalar(5, 2, 2)
    assert out2.to_dicts() == {0: {0: 5}, 1: {1: 5}}


@pytest.mark.parametrize("as_matrix", [False, True])
def test_mask_new_pairs(as_matrix):
    """Reference test_mask.py:9-56: Mask.new(dtype, mask=m2) over all 8x8
    mask pairs, plus complement, for vector and matrix parents."""
    for mask_dtype in [bool, int]:
        v1 = gb.Vector(mask_dtype, 10)
        v1[3:6] = 0
        v1[:3] = 10
        v2 = gb.Vector(mask_dtype, 10)
        v2[1::3] = 0
        v2[::3] = 10
        if as_matrix:
            v1 = v1._as_matrix()
            v2 = v2._as_matrix()
        masks = [v1.S, v1.V, ~v1.S, ~v1.V, v2.S, v2.V, ~v2.S, ~v2.V]
        for m1 in masks:
            for m2 in masks:
                expected = gb.Vector(bool, 10)
                if as_matrix:
                    expected = expected._as_matrix()
                expected[...] << True
                expected = expected.dup(mask=m1).dup(mask=m2)
                result = m1.new(mask=m2, name="howdy")
                assert result.name == "howdy"
                assert result.isequal(expected, check_dtype=True)
                # complemented
                expected(~expected.S, replace=True) << True
                result = m1.new(mask=m2, complement=True)
                assert result.isequal(expected, check_dtype=True)
        for m in masks:
            expected = gb.Vector(bool, 10)
            if as_matrix:
                expected = expected._as_matrix()
            expected[...] << True
            expected = expected.dup(mask=m)
            result = m.new()
            assert result.isequal(expected, check_dtype=True)
        with pytest.raises(TypeError):
            m.new(mask=object())


@pytest.mark.parametrize("as_matrix", [False, True])
def test_mask_or_and_pairs(as_matrix):
    """Reference test_mask.py:58-126: m1 | m2 and m1 & m2 over all pairs."""
    for mask_dtype in [bool, int]:
        v1 = gb.Vector(mask_dtype, 10)
        v1[3:6] = 0
        v1[:3] = 10
        v2 = gb.Vector(mask_dtype, 10)
        v2[1::3] = 0
        v2[::3] = 10
        if as_matrix:
            v1 = v1._as_matrix()
            v2 = v2._as_matrix()
        masks = [v1.S, v1.V, ~v1.S, ~v1.V, v2.S, v2.V, ~v2.S, ~v2.V]
        for m1 in masks:
            for m2 in masks:
                expected = gb.Vector(bool, 10)
                if as_matrix:
                    expected = expected._as_matrix()
                expected(m1) << True
                expected(m2) << True
                result = (m1 | m2).new()
                assert result.isequal(expected, check_dtype=True)

                expected2 = gb.Vector(bool, 10)
                if as_matrix:
                    expected2 = expected2._as_matrix()
                expected2[...] << True
                expected2 = expected2.dup(mask=m1).dup(mask=m2)
                result = (m1 & m2).new()
                assert result.isequal(expected2, check_dtype=True)
        with pytest.raises(TypeError):
            m1 | object()
        with pytest.raises(TypeError):
            m1 & object()
