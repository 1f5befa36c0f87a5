"""Operator dtype-coercion tables (reference monoid.py:395-431,
binary.py:800-875, semiring.py:391-510) and the Appendix-B builtin
semiring grammar: every monoid×mult×dtype cell of the main GxB regex
must resolve to a typed semiring.
"""

import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, monoid, semiring
from graphblas_tpu.core import dtypes as dt

D10 = ["INT8", "UINT8", "INT16", "UINT16", "INT32", "UINT32", "INT64",
       "UINT64", "FP32", "FP64"]
MONOIDS = ["min", "max", "plus", "times", "any"]
MULTS = ["first", "second", "pair", "min", "max", "plus", "minus", "rminus",
         "times", "cdiv", "rdiv", "iseq", "isne", "isgt", "islt", "isge",
         "isle", "lor", "land", "lxor"]
BOOL_MONOIDS = ["lor", "land", "lxor", "eq", "any"]
BOOL_MULTS = ["eq", "ne", "gt", "lt", "ge", "le", "first", "second", "pair"]


@pytest.mark.parametrize("mono", MONOIDS)
@pytest.mark.parametrize("mult", MULTS)
def test_main_semiring_grammar(mono, mult):
    """GxB_(MIN|MAX|PLUS|TIMES|ANY)_<mult>_<D10> (ref semiring.py:179-185)."""
    ring = getattr(semiring, f"{mono}_{mult}")
    for d in D10:
        typed = ring[d]
        assert typed.parent is ring


@pytest.mark.parametrize("mono", BOOL_MONOIDS)
@pytest.mark.parametrize("mult", BOOL_MULTS)
def test_bool_semiring_grammar(mono, mult):
    """GxB_(LOR|LAND|LXOR|EQ|ANY)_<cmp>_<D10> and _BOOL families."""
    ring = getattr(semiring, f"{mono}_{mult}")
    for d in D10 + ["BOOL"]:
        typed = ring[d]
        assert typed.return_type == dt.BOOL or typed.parent is ring


def test_bitwise_semiring_grammar():
    for mono in ("band", "bor", "bxor", "bxnor"):
        for mult in ("band", "bor", "bxor", "bxnor"):
            ring = getattr(semiring, f"{mono}_{mult}")
            for d in ("UINT8", "UINT16", "UINT32", "UINT64"):
                assert ring[d].type == dt.lookup_dtype(d)
            # signed ints coerce to unsigned (ref semiring.py:453-460)
            assert ring["INT8"].type == dt.UINT16
            assert ring["INT16"].type == dt.UINT32
            assert ring["INT32"].type == dt.UINT64
            assert ring["INT64"].type == dt.UINT64


def test_plus_pair_bool():
    """Boolean renaming: plus_pair on a BOOL adjacency (VERDICT missing #5)."""
    t = semiring.plus_pair["BOOL"]
    assert t.return_type == dt.BOOL
    rows = [1, 2, 2, 3, 3, 3]
    cols = [0, 0, 1, 0, 1, 2]
    L = gb.Matrix.from_coo(rows, cols, [True] * 6, nrows=4, ncols=4)
    C = L.mxm(L.T, semiring.plus_pair).new(mask=L.S)
    assert C.nvals == 3
    C2 = L.mxm(L.T, semiring.plus_pair["INT64"]).new(mask=L.S)
    assert C2.reduce_scalar().new().value == 4


def test_bool_monoid_renames():
    assert monoid.max["BOOL"].return_type == dt.BOOL
    assert monoid.min["BOOL"].return_type == dt.BOOL
    assert monoid.times["BOOL"].return_type == dt.BOOL
    # plus deliberately has no BOOL in the namespace (ref monoid.py:405)
    with pytest.raises(KeyError):
        monoid.plus["BOOL"]


def test_logical_monoids_numeric_inputs():
    for name in ("lor", "land", "lxor", "lxnor"):
        m = getattr(monoid, name)
        for d in D10:
            typed = m[d]
            assert typed.type == dt.BOOL  # inputs cast to BOOL
            assert typed.return_type == dt.BOOL


def test_float_binary_coercions():
    for name in ("atan2", "copysign", "fmod", "hypot", "remainder"):
        op = getattr(binary, name)
        for d in ("BOOL", "INT8", "INT16", "UINT8", "UINT16"):
            assert op[d].type == dt.FP32
        for d in ("INT32", "INT64", "UINT32", "UINT64"):
            assert op[d].type == dt.FP64


def test_coerced_semiring_computes():
    v = gb.Vector.from_coo([0, 1, 2], [3, -1, 2], size=3)
    A = gb.Matrix.from_coo([0, 1, 2], [0, 0, 0], [1, 1, 1], nrows=3, ncols=1)
    # lor_times over ints: products in int, reduced as BOOL
    w = v.vxm(A, semiring.lor_times).new()
    assert w.to_coo()[1].tolist() == [True]
