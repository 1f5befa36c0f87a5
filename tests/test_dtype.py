import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import dtypes
from graphblas_tpu.dtypes import lookup_dtype, unify


def test_builtin_dtypes():
    assert dtypes.BOOL.np_type == np.bool_
    assert dtypes.INT8.np_type == np.int8
    assert dtypes.INT64.np_type == np.int64
    assert dtypes.UINT64.np_type == np.uint64
    assert dtypes.FP32.np_type == np.float32
    assert dtypes.FP64.np_type == np.float64
    assert dtypes.FC64.np_type == np.complex128


def test_lookup():
    assert lookup_dtype("INT64") is dtypes.INT64
    assert lookup_dtype("int64") is dtypes.INT64
    assert lookup_dtype(int) is dtypes.INT64
    assert lookup_dtype(float) is dtypes.FP64
    assert lookup_dtype(bool) is dtypes.BOOL
    assert lookup_dtype(np.dtype(np.int32)) is dtypes.INT32
    assert lookup_dtype(dtypes.FP32) is dtypes.FP32
    with pytest.raises(TypeError, match="Bad dtype"):
        lookup_dtype(None)
    with pytest.raises(ValueError, match="Unknown dtype"):
        lookup_dtype("not_a_dtype")


def test_dtype_eq():
    assert dtypes.INT64 == "INT64"
    assert dtypes.INT64 == np.int64
    assert dtypes.INT64 != dtypes.INT32
    with pytest.raises(TypeError):
        dtypes.INT64 == "garbage_dtype"


def test_unify():
    assert unify(dtypes.INT32, dtypes.INT64) is dtypes.INT64
    assert unify(dtypes.INT8, dtypes.UINT16) is dtypes.INT32
    assert unify(dtypes.BOOL, dtypes.UINT16) is dtypes.UINT16
    assert unify(dtypes.FP32, dtypes.INT32) is dtypes.FP64
    assert unify(dtypes.FP32, dtypes.FP32) is dtypes.FP32
    # scalar asymmetry: a scalar doesn't force promotion beyond the collection
    assert unify(dtypes.INT8, dtypes.INT64, is_left_scalar=True) is dtypes.INT64


def test_dtype_attrs():
    assert dtypes.INT8.is_signed_int
    assert dtypes.UINT8.is_unsigned_int
    assert dtypes.FP32.is_float
    assert dtypes.FC32.is_complex
    assert dtypes.BOOL.is_bool
    assert not dtypes.FP64.is_int


def test_register_udt():
    udt = dtypes.register_anonymous(np.dtype([("x", np.float64), ("y", np.float64)]))
    assert udt._is_udt
    udt2 = dtypes.register_anonymous(np.dtype([("x", np.float64), ("y", np.float64)]))
    assert udt is udt2
    sub = dtypes.register_anonymous(np.dtype("(3,)float64"))
    assert sub._is_udt
    with pytest.raises(ValueError, match="identifier"):
        dtypes.register_new("not an identifier", np.dtype("(2,)int8"))
    with pytest.raises(ValueError, match="unavailable"):
        dtypes.register_new("INT64", np.dtype("(2,)int8"))


def test_dtype_to_string_roundtrip():
    from graphblas_tpu.core.dtypes import _dtype_to_string, _string_to_dtype

    for dt in [dtypes.BOOL, dtypes.INT32, dtypes.FP64]:
        assert _string_to_dtype(_dtype_to_string(dt)) is dt
