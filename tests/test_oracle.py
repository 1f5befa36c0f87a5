"""Randomized comparison of the engine against a dense numpy oracle.

This plays the role of the reference's behavioral suite run against the real
C engine (SURVEY §4): same operations computed two ways must agree exactly
for integer/boolean data and within fp tolerance for floats.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes, monoid, semiring

from .helpers import gb_from_pair, random_sparse

SHAPES = [(6, 7), (13, 11)]


def _oracle_ewise_add(av, ao, bv, bo, f):
    both = ao & bo
    out_ok = ao | bo
    out = np.where(both, f(av, bv), np.where(ao, av, bv))
    return out, out_ok


def _oracle_ewise_mult(av, ao, bv, bo, f):
    return f(av, bv), ao & bo


def _oracle_mxm(av, ao, bv, bo, add_f, add_ident, mult_f):
    m, k = av.shape
    n = bv.shape[1]
    out = np.full((m, n), add_ident, dtype=np.result_type(av, bv))
    out_ok = np.zeros((m, n), bool)
    for i in range(m):
        for j in range(n):
            acc = None
            for kk in range(k):
                if ao[i, kk] and bo[kk, j]:
                    p = mult_f(av[i, kk], bv[kk, j])
                    acc = p if acc is None else add_f(acc, p)
            if acc is not None:
                out[i, j] = acc
                out_ok[i, j] = True
    return out, out_ok


BIN_CASES = [
    ("plus", np.int64, lambda x, y: x + y),
    ("times", np.int64, lambda x, y: x * y),
    ("min", np.int64, np.minimum),
    ("max", np.float64, np.maximum),
    ("first", np.int64, lambda x, y: x),
    ("second", np.float64, lambda x, y: y),
    ("minus", np.int64, lambda x, y: x - y),
    ("land", np.bool_, lambda x, y: x & y),
    ("lxor", np.bool_, lambda x, y: x ^ y),
]


@pytest.mark.parametrize("opname,dtype,f", BIN_CASES)
@pytest.mark.parametrize("shape", SHAPES)
def test_ewise_random(rng, opname, dtype, f, shape):
    av, ao = random_sparse(rng, shape, dtype=dtype)
    bv, bo = random_sparse(rng, shape, dtype=dtype)
    A = gb_from_pair(av, ao)
    B = gb_from_pair(bv, bo)
    op = getattr(binary, opname)

    got = A.ewise_add(B, op).new()
    exp_v, exp_ok = _oracle_ewise_add(av, ao, bv, bo, f)
    gv, gok = (np.asarray(x) for x in got._host_arrays())
    np.testing.assert_array_equal(gok, exp_ok)
    np.testing.assert_allclose(gv[gok], exp_v[exp_ok].astype(gv.dtype), rtol=1e-14)

    got = A.ewise_mult(B, op).new()
    exp_v, exp_ok = _oracle_ewise_mult(av, ao, bv, bo, f)
    gv, gok = (np.asarray(x) for x in got._host_arrays())
    np.testing.assert_array_equal(gok, exp_ok)
    np.testing.assert_allclose(gv[gok], exp_v[exp_ok].astype(gv.dtype), rtol=1e-14)


RING_CASES = [
    ("plus_times", np.int64, (lambda x, y: x + y, 0), lambda x, y: x * y),
    ("plus_times", np.float64, (lambda x, y: x + y, 0.0), lambda x, y: x * y),
    ("min_plus", np.int64, (np.minimum, np.iinfo(np.int64).max), lambda x, y: x + y),
    ("max_times", np.int64, (np.maximum, np.iinfo(np.int64).min), lambda x, y: x * y),
    ("plus_pair", np.int64, (lambda x, y: x + y, 0), lambda x, y: 1),
    ("any_pair", np.bool_, (lambda x, y: x or y, False), lambda x, y: True),
    ("lor_land", np.bool_, (lambda x, y: x | y, False), lambda x, y: x & y),
    ("min_first", np.int64, (np.minimum, np.iinfo(np.int64).max), lambda x, y: x),
    ("min_second", np.int64, (np.minimum, np.iinfo(np.int64).max), lambda x, y: y),
    ("plus_min", np.int64, (lambda x, y: x + y, 0), np.minimum),
]


@pytest.mark.parametrize("ringname,dtype,addspec,mult_f", RING_CASES)
def test_mxm_random(rng, ringname, dtype, addspec, mult_f):
    add_f, add_ident = addspec
    av, ao = random_sparse(rng, (8, 9), dtype=dtype, low=1, high=6)
    bv, bo = random_sparse(rng, (9, 7), dtype=dtype, low=1, high=6)
    A = gb_from_pair(av, ao)
    B = gb_from_pair(bv, bo)
    ring = getattr(semiring, ringname)
    got = A.mxm(B, ring).new()
    exp_v, exp_ok = _oracle_mxm(av, ao, bv, bo, add_f, add_ident, mult_f)
    gv, gok = (np.asarray(x) for x in got._host_arrays())
    np.testing.assert_array_equal(gok, exp_ok)
    if np.issubdtype(dtype, np.floating):
        np.testing.assert_allclose(gv[gok], exp_v[exp_ok], rtol=1e-12)
    else:
        np.testing.assert_array_equal(gv[gok], exp_v[exp_ok].astype(gv.dtype))


@pytest.mark.parametrize("ringname,dtype,addspec,mult_f", RING_CASES[:6])
def test_mxv_random(rng, ringname, dtype, addspec, mult_f):
    add_f, add_ident = addspec
    av, ao = random_sparse(rng, (8, 9), dtype=dtype, low=1, high=6)
    bv, bo = random_sparse(rng, (9,), dtype=dtype, low=1, high=6)
    A = gb_from_pair(av, ao)
    x = gb_from_pair(bv, bo)
    ring = getattr(semiring, ringname)
    got = A.mxv(x, ring).new()
    exp_v, exp_ok = _oracle_mxm(av, ao, bv[:, None], bo[:, None], add_f,
                                add_ident, mult_f)
    gv, gok = (np.asarray(x) for x in got._host_arrays())
    np.testing.assert_array_equal(gok, exp_ok[:, 0])
    if np.issubdtype(dtype, np.floating):
        np.testing.assert_allclose(gv[gok], exp_v[:, 0][exp_ok[:, 0]], rtol=1e-12)
    else:
        np.testing.assert_array_equal(gv[gok].astype(np.float64),
                                      exp_v[:, 0][exp_ok[:, 0]].astype(np.float64))


@pytest.mark.parametrize("maskkind", ["S", "V", "~S", "~V"])
@pytest.mark.parametrize("replace", [False, True])
@pytest.mark.parametrize("use_accum", [False, True])
def test_masked_update_random(rng, maskkind, replace, use_accum):
    cv, co = random_sparse(rng, (9, 8), dtype=np.int64)
    zv, zo = random_sparse(rng, (9, 8), dtype=np.int64)
    mv, mo = random_sparse(rng, (9, 8), dtype=np.int64)
    C = gb_from_pair(cv, co)
    Z = gb_from_pair(zv, zo)
    M = gb_from_pair(mv, mo)
    mask = {"S": M.S, "V": M.V, "~S": ~M.S, "~V": ~M.V}[maskkind]
    accum = binary.plus if use_accum else None
    C(mask=mask, accum=accum, replace=replace) << Z

    mask_arr = {"S": mo, "V": mo & (mv != 0), "~S": ~mo,
                "~V": ~(mo & (mv != 0))}[maskkind]
    if use_accum:
        both = co & zo
        new_v = np.where(both, cv + zv, np.where(zo, zv, cv))
        new_ok = co | zo
    else:
        new_v, new_ok = zv, zo
    exp_ok = np.where(mask_arr, new_ok, False if replace else co)
    exp_v = np.where(mask_arr & new_ok, new_v, cv)
    gv, gok = (np.asarray(x) for x in C._host_arrays())
    np.testing.assert_array_equal(gok, exp_ok)
    np.testing.assert_array_equal(gv[gok], exp_v[gok])


@pytest.mark.parametrize("mononame,red,ident", [
    ("plus", np.sum, 0),
    ("min", np.min, np.iinfo(np.int64).max),
    ("max", np.max, np.iinfo(np.int64).min),
    ("times", np.prod, 1),
])
def test_reduce_random(rng, mononame, red, ident):
    av, ao = random_sparse(rng, (7, 9), dtype=np.int64, low=1, high=5)
    A = gb_from_pair(av, ao)
    mono = getattr(monoid, mononame)
    got = A.reduce_rowwise(mono).new()
    gv, gok = (np.asarray(x) for x in got._host_arrays())
    exp_ok = ao.any(axis=1)
    np.testing.assert_array_equal(gok, exp_ok)
    masked = np.where(ao, av, ident)
    exp = red(masked, axis=1)
    np.testing.assert_array_equal(gv[gok], exp[exp_ok])
    s = A.reduce_scalar(mono).new()
    if ao.any():
        assert s.value == red(av[ao])


def test_extract_assign_random(rng):
    av, ao = random_sparse(rng, (10, 12), dtype=np.float64)
    A = gb_from_pair(av, ao)
    rows = np.array([7, 0, 3, 3, 9])
    cols = np.array([11, 2, 5])
    B = A[rows, cols].new()
    gv, gok = (np.asarray(x) for x in B._host_arrays())
    np.testing.assert_array_equal(gok, ao[np.ix_(rows, cols)])
    np.testing.assert_array_equal(gv[gok], av[np.ix_(rows, cols)][gok])
    # assign back a scalar
    A[rows, cols] = 0.5
    for i in rows:
        for j in cols:
            assert A[int(i), int(j)].new().value == 0.5
