"""Compare every numpy-family op against numpy itself on random arrays
(reference test strategy: tests/test_numpyops.py)."""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes, unary

UNARY_FLOAT = ["exp", "log1p", "sqrt", "sin", "cos", "tanh", "rint", "fabs",
               "sign", "square", "spacing", "deg2rad", "cbrt"]
UNARY_INT = ["negative", "abs", "square", "sign"]
BINARY_FLOAT = ["add", "subtract", "multiply", "true_divide", "hypot",
                "arctan2", "maximum", "minimum", "nextafter", "copysign",
                "logaddexp", "float_power", "fmod"]
BINARY_INT = ["add", "subtract", "multiply", "gcd", "lcm", "bitwise_and",
              "bitwise_or", "bitwise_xor", "mod", "fmax", "fmin"]


@pytest.mark.parametrize("name", UNARY_FLOAT)
def test_numpy_unary_float(rng, name):
    vals = rng.uniform(0.1, 4.0, size=17)
    v = gb.Vector.from_dense(vals)
    op = getattr(unary.numpy, name)
    got = v.apply(op).new().to_dense()
    expected = getattr(np, name)(vals)
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("name", UNARY_INT)
def test_numpy_unary_int(rng, name):
    vals = rng.integers(-5, 6, size=17)
    v = gb.Vector.from_dense(vals)
    op = getattr(unary.numpy, name)
    got = v.apply(op).new().to_dense()
    expected = getattr(np, name)(vals)
    np.testing.assert_array_equal(got, expected)


@pytest.mark.parametrize("name", BINARY_FLOAT)
def test_numpy_binary_float(rng, name):
    a = rng.uniform(0.1, 4.0, size=17)
    b = rng.uniform(0.1, 4.0, size=17)
    va = gb.Vector.from_dense(a)
    vb = gb.Vector.from_dense(b)
    op = getattr(binary.numpy, name)
    got = va.ewise_mult(vb, op).new().to_dense()
    expected = getattr(np, name)(a, b)
    np.testing.assert_allclose(got, expected, rtol=1e-12, atol=1e-15)


@pytest.mark.parametrize("name", BINARY_INT)
def test_numpy_binary_int(rng, name):
    a = rng.integers(1, 10, size=17)
    b = rng.integers(1, 10, size=17)
    va = gb.Vector.from_dense(a)
    vb = gb.Vector.from_dense(b)
    op = getattr(binary.numpy, name)
    got = va.ewise_mult(vb, op).new().to_dense()
    expected = getattr(np, name)(a, b)
    np.testing.assert_array_equal(got, expected)


def test_mapnumpy_aliases_builtins():
    with gb.config.set(mapnumpy=True):
        # cached or fresh: mapped names resolve to the builtin op objects
        import importlib

        import graphblas_tpu.binary.numpy as bn

        if "add" in vars(bn):
            assert vars(bn)["add"] is binary.plus
        else:
            assert bn.add is binary.plus


def test_numpy_monoid_semiring(rng):
    from graphblas_tpu import monoid, semiring

    assert monoid.numpy.add is not None
    ring = semiring.numpy.add_multiply
    v = gb.Vector.from_dense(rng.integers(1, 5, size=9))
    w = gb.Vector.from_dense(rng.integers(1, 5, size=9))
    s = v.inner(w, ring).new()
    assert s.value == int(np.dot(v.to_dense(), w.to_dense()))
