"""Aggregator completeness vs numpy oracles (reference agg recipes are the
correctness oracle, SURVEY §3.5)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import agg, dtypes

from .helpers import gb_from_pair, make_A, random_sparse


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


# --------------------------------------------------------------------- #
# reference-compatible Aggregator constructor (reference agg.py:30-140)

def test_custom_aggregator_monoid():
    from graphblas_tpu.core.operator.agg import Aggregator

    my_sum = Aggregator("my_sum", monoid=gb.monoid.plus)
    v = gb.Vector.from_coo([0, 1, 3], [1.0, 2.0, 3.0], size=5)
    assert v.reduce(my_sum).new().value == 6.0


def test_custom_aggregator_semiring_initval():
    from graphblas_tpu.core.operator.agg import Aggregator

    my_sq = Aggregator("my_sq", initval=2, semiring=gb.semiring.plus_pow,
                       semiring2=gb.semiring.plus_first)
    v = gb.Vector.from_coo([0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0], size=6)
    assert v.reduce(my_sq).new().value == 30.0
    A = gb.Matrix.from_coo([0, 0, 1], [0, 1, 1], [1.0, 3.0, 5.0],
                           nrows=2, ncols=2)
    np.testing.assert_allclose(A.reduce_rowwise(my_sq).new().to_dense(),
                               [10.0, 25.0])


def test_custom_aggregator_switch_finalize():
    from graphblas_tpu.core.operator.agg import Aggregator

    lae2 = Aggregator("lae2", initval=2, semiring=gb.semiring.plus_pow,
                      switch=True, semiring2=gb.semiring.plus_first,
                      finalize=gb.unary.log2)
    v = gb.Vector.from_coo([0, 1, 2, 3], [1.0, 2.0, 3.0, 4.0], size=6)
    expected = np.log2(np.sum(2.0 ** np.array([1.0, 2.0, 3.0, 4.0])))
    np.testing.assert_allclose(v.reduce(lae2).new().value, expected)


def test_custom_aggregator_applybegin():
    from graphblas_tpu.core.operator.agg import Aggregator

    l1 = Aggregator("l1", applybegin=gb.unary.abs,
                    semiring=gb.semiring.plus_first,
                    semiring2=gb.semiring.plus_first)
    w = gb.Vector.from_coo([0, 1], [-3.0, 4.0], size=3)
    assert w.reduce(l1).new().value == 7.0


def test_custom_aggregator_composite():
    from graphblas_tpu.core.operator.agg import Aggregator

    my_mean = Aggregator("my_mean", composite=[gb.agg.count, gb.agg.sum],
                         finalize=lambda c, s: s / c)
    v = gb.Vector.from_coo([0, 1, 3, 4], [1.0, 2.0, 3.0, 4.0], size=6)
    assert v.reduce(my_mean).new().value == 2.5


def test_custom_aggregator_errors():
    from graphblas_tpu.core.operator.agg import Aggregator

    with pytest.raises(TypeError):
        Aggregator("bad")
    with pytest.raises(TypeError):
        Aggregator("bad", composite=[gb.agg.count])  # missing finalize
    with pytest.raises(TypeError):
        Aggregator("bad", monoid=gb.binary.plus)  # not a monoid


def test_reduce_agg_argminmax_matrix():
    # reference test_matrix.py:1458 — exact expected index vectors
    A = make_A()
    expected = gb.Vector.from_coo([0, 1, 2, 3, 4, 5, 6], [1, 6, 5, 0, 5, 2, 4])
    assert A.reduce_rowwise(agg.ss.argmin).new().isequal(expected)
    assert A.T.reduce_columnwise(agg.ss.argmin).new().isequal(expected)
    expected = gb.Vector.from_coo([0, 1, 2, 3, 4, 5, 6], [3, 4, 5, 0, 5, 2, 3])
    assert A.reduce_rowwise(agg.ss.argmax).new().isequal(expected)
    assert A.T.reduce_columnwise(agg.ss.argmax).new().isequal(expected)

    expected = gb.Vector.from_coo([0, 1, 2, 3, 4, 5, 6], [3, 0, 5, 0, 6, 2, 1])
    assert A.reduce_columnwise(agg.ss.argmin).new().isequal(expected)
    assert A.T.reduce_rowwise(agg.ss.argmin).new().isequal(expected)
    expected = gb.Vector.from_coo([0, 1, 2, 3, 4, 5, 6], [3, 0, 6, 6, 1, 4, 1])
    assert A.reduce_columnwise(agg.ss.argmax).new().isequal(expected)
    assert A.T.reduce_rowwise(agg.ss.argmax).new().isequal(expected)

    with pytest.raises(ValueError):
        A.reduce_scalar(agg.ss.argmin)


def test_reduce_agg_firstlast_matrix():
    # reference test_matrix.py:1510
    A = make_A()
    expected = gb.Vector.from_coo([0, 1, 2, 3, 4, 5, 6], [2, 8, 1, 3, 7, 1, 5])
    assert A.reduce_rowwise(agg.ss.first).new().isequal(expected)
    assert A.T.reduce_columnwise(agg.ss.first).new().isequal(expected)
    expected = gb.Vector.from_coo([0, 1, 2, 3, 4, 5, 6], [3, 4, 1, 3, 7, 1, 3])
    assert A.reduce_rowwise(agg.ss.last).new().isequal(expected)
    assert A.T.reduce_columnwise(agg.ss.last).new().isequal(expected)


def test_reduce_agg_firstlast_index_matrix():
    # reference test_matrix.py:1566
    A = make_A()
    expected = gb.Vector.from_coo([0, 1, 2, 3, 4, 5, 6], [1, 4, 5, 0, 5, 2, 2])
    assert A.reduce_rowwise(agg.ss.first_index).new().isequal(expected)
    expected = gb.Vector.from_coo([0, 1, 2, 3, 4, 5, 6], [3, 6, 5, 2, 5, 2, 4])
    assert A.reduce_rowwise(agg.ss.last_index).new().isequal(expected)


def test_reduce_agg_empty_matrix():
    # reference test_matrix.py:1612
    A = gb.Matrix(int, 3, 4)
    for name in ["sum", "prod", "min", "max", "count", "mean", "varp",
                 "L2norm", "peak_to_peak"]:
        aggr = getattr(agg, name)
        w = A.reduce_rowwise(aggr).new()
        assert w.nvals == 0, name
        w = A.reduce_columnwise(aggr).new()
        assert w.nvals == 0, name
        s = A.reduce_scalar(aggr).new()
        assert s.is_empty, name
