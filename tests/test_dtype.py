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


def test_unify_dtypes_exact():
    # reference test_dtype.py:104 — the exact promotion table
    assert dtypes.unify(dtypes.BOOL, dtypes.BOOL) == dtypes.BOOL
    assert dtypes.unify(dtypes.BOOL, dtypes.INT16) == dtypes.INT16
    assert dtypes.unify(dtypes.INT16, dtypes.BOOL) == dtypes.INT16
    assert dtypes.unify(dtypes.INT16, dtypes.INT8) == dtypes.INT16
    assert dtypes.unify(dtypes.UINT32, dtypes.UINT8) == dtypes.UINT32
    assert dtypes.unify(dtypes.UINT32, dtypes.FP32) == dtypes.FP64
    assert dtypes.unify(dtypes.INT32, dtypes.FP32) == dtypes.FP64
    assert dtypes.unify(dtypes.FP64, dtypes.UINT8) == dtypes.FP64
    assert dtypes.unify(dtypes.FP64, dtypes.FP32) == dtypes.FP64
    assert dtypes.unify(dtypes.INT16, dtypes.UINT16) == dtypes.INT32
    assert dtypes.unify(dtypes.UINT64, dtypes.INT8) == dtypes.FP64


def test_unify_matches_numpy():
    # reference test_dtype.py:153 — pairwise promotion == numpy's
    import itertools

    all_dtypes = [dtypes.BOOL, dtypes.INT8, dtypes.UINT8, dtypes.INT16,
                  dtypes.UINT16, dtypes.INT32, dtypes.UINT32, dtypes.INT64,
                  dtypes.UINT64, dtypes.FP32, dtypes.FP64]
    for t1, t2 in itertools.product(all_dtypes, all_dtypes):
        gb_type = dtypes.unify(t1, t2)
        np_type = type(t1.np_type.type(0) + t2.np_type.type(0))
        assert gb_type == dtypes.lookup_dtype(np_type), (t1, t2, gb_type)


def test_auto_register_subarray():
    # reference test_dtype.py:200
    np_type = np.dtype("(17,)int16")
    assert dtypes.lookup_dtype(np_type).np_type == np_type


def test_record_dtype_from_dict():
    # reference test_dtype.py:219
    dtype = dtypes.lookup_dtype({"x": int, "y": float})
    assert dtype.np_type.names == ("x", "y")


def test_dtype_bad_comparison():
    with pytest.raises(TypeError):
        dtypes.BOOL == object()  # noqa: B015


def test_pickle_all_builtins():
    # reference test_dtype.py:139
    import pickle

    for name in ["BOOL", "INT8", "UINT8", "INT16", "UINT16", "INT32",
                 "UINT32", "INT64", "UINT64", "FP32", "FP64"]:
        val = getattr(dtypes, name)
        assert pickle.loads(pickle.dumps(val)) == val


def test_lookup_by_many_keys():
    # reference test_dtype.py:77-103
    assert dtypes.lookup_dtype("INT64") == dtypes.INT64
    assert dtypes.lookup_dtype(int) == dtypes.INT64
    assert dtypes.lookup_dtype(np.int64) == dtypes.INT64
    assert dtypes.lookup_dtype(np.dtype("int64")) == dtypes.INT64
    assert dtypes.lookup_dtype(bool) == dtypes.BOOL
    assert dtypes.lookup_dtype(float) == dtypes.FP64
    assert dtypes.lookup_dtype("fp32") == dtypes.FP32
