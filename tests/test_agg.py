"""Aggregator completeness vs numpy oracles (reference agg recipes are the
correctness oracle, SURVEY §3.5)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import agg, dtypes

from .helpers import gb_from_pair, random_sparse


def _masked(vals, ok):
    return vals[ok]


CASES = [
    ("sum", lambda a: a.sum()),
    ("prod", lambda a: a.prod()),
    ("min", lambda a: a.min()),
    ("max", lambda a: a.max()),
    ("count", lambda a: len(a)),
    ("count_nonzero", lambda a: int((a != 0).sum())),
    ("count_zero", lambda a: int((a == 0).sum())),
    ("sum_of_squares", lambda a: (a * a).sum()),
    ("L0norm", lambda a: int((a != 0).sum())),
    ("L1norm", lambda a: np.abs(a).sum()),
    ("L2norm", lambda a: np.sqrt((np.abs(a).astype(float) ** 2).sum())),
    ("Linfnorm", lambda a: np.abs(a).max()),
    ("mean", lambda a: a.mean()),
    ("peak_to_peak", lambda a: a.max() - a.min()),
    ("varp", lambda a: a.astype(float).var()),
    ("vars", lambda a: a.astype(float).var(ddof=1)),
    ("stdp", lambda a: a.astype(float).std()),
    ("stds", lambda a: a.astype(float).std(ddof=1)),
    ("hypot", lambda a: np.sqrt((a.astype(float) ** 2).sum())),
    ("logaddexp", lambda a: np.logaddexp.reduce(a.astype(float))),
    ("logaddexp2", lambda a: np.logaddexp2.reduce(a.astype(float))),
    ("geometric_mean", lambda a: np.exp(np.log(a.astype(float)).mean())),
    ("harmonic_mean", lambda a: len(a) / (1.0 / a.astype(float)).sum()),
    ("root_mean_square", lambda a: np.sqrt((a.astype(float) ** 2).mean())),
    ("sum_of_inverses", lambda a: (1.0 / a.astype(float)).sum()),
    ("exists", lambda a: 1),
]


@pytest.mark.parametrize("name,oracle", CASES)
def test_agg_scalar_reduce(rng, name, oracle):
    vals, ok = random_sparse(rng, (23,), density=0.6, dtype=np.int64, low=1, high=9)
    v = gb_from_pair(vals, ok)
    a = getattr(agg, name)
    got = v.reduce(a).new().value
    exp = oracle(_masked(vals, ok))
    if isinstance(exp, float) or isinstance(got, float):
        assert abs(float(got) - float(exp)) < 1e-9 * max(1, abs(float(exp)))
    else:
        assert got == exp


@pytest.mark.parametrize("name,oracle", CASES[:14])
def test_agg_rowwise(rng, name, oracle):
    vals, ok = random_sparse(rng, (6, 9), density=0.6, dtype=np.int64, low=1, high=9)
    A = gb_from_pair(vals, ok)
    a = getattr(agg, name)
    got = A.reduce_rowwise(a).new()
    gv, gok = (np.asarray(x) for x in got._host_arrays())
    for i in range(6):
        row = vals[i][ok[i]]
        if len(row) == 0:
            assert not gok[i]
        else:
            assert gok[i]
            exp = oracle(row)
            assert abs(float(gv[i]) - float(exp)) < 1e-9 * max(1, abs(float(exp)))


def test_agg_ss_positional(rng):
    vals = np.array([5, 2, 9, 2])
    v = gb.Vector.from_dense(vals)
    assert v.reduce(agg.ss.argmin).new().value == 1
    assert v.reduce(agg.ss.argmax).new().value == 2
    assert v.reduce(agg.ss.first).new().value == 5
    assert v.reduce(agg.ss.last).new().value == 2
    assert v.reduce(agg.ss.first_index).new().value == 0
    assert v.reduce(agg.ss.last_index).new().value == 3
    # sparse vector
    w = gb.Vector.from_coo([2, 5], [7, 3], size=9)
    assert w.reduce(agg.ss.first).new().value == 7
    assert w.reduce(agg.ss.last_index).new().value == 5
    assert w.reduce(agg.ss.argmin).new().value == 5


def test_agg_bitwise(rng):
    v = gb.Vector.from_dense(np.array([0b1100, 0b1010], np.uint8))
    assert v.reduce(agg.bitwise_all).new().value == 0b1000
    assert v.reduce(agg.bitwise_any).new().value == 0b1110


def test_agg_callable():
    v = gb.Vector.from_dense(np.array([1, 2, 3]))
    assert agg.sum(v).new().value == 6
    A = gb.Matrix.from_dense(np.array([[1, 2], [3, 4]]))
    assert agg.sum(A).new().value == 10
