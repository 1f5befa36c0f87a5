import io as _io

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import io as gbio

from .helpers import make_A


def test_mmwrite_mmread_roundtrip(tmp_path):
    A = make_A()
    path = tmp_path / "a.mtx"
    gbio.mmwrite(str(path), A)
    B = gbio.mmread(str(path))
    assert B.isequal(A.dup(dtype="INT64")) or B.dup(dtype="INT64").isequal(A)


def test_mmwrite_mmread_stringio():
    A = make_A().dup(dtype="FP64")
    buf = _io.StringIO()
    gbio.mmwrite(buf, A)
    text = buf.getvalue()
    assert text.startswith("%%MatrixMarket matrix coordinate real general")
    B = gbio.mmread(_io.StringIO(text))
    assert B.isclose(A)


def test_mmread_native_pattern_symmetric():
    text = """%%MatrixMarket matrix coordinate pattern symmetric
3 3 2
2 1
3 2
"""
    B = gbio._mmread_native(_io.StringIO(text))
    assert B.nvals == 4
    assert B[1, 0].new().value == 1
    assert B[0, 1].new().value == 1


def test_scipy_roundtrip():
    scipy = pytest.importorskip("scipy")
    A = make_A()
    s = gbio.to_scipy_sparse(A, "csr")
    assert s.shape == (7, 7)
    B = gbio.from_scipy_sparse(s)
    assert B.isequal(A.dup(dtype=B.dtype))


def test_networkx_roundtrip():
    nx = pytest.importorskip("networkx")
    A = make_A().dup(dtype="FP64")
    G = gbio.to_networkx(A)
    assert G.number_of_edges() == 12
    B = gbio.from_networkx(G, nodelist=range(7))
    assert B.isclose(A)


def test_from_to_numpy():
    arr = np.array([[1.0, 0.0], [2.0, 3.0]])
    M = gbio.from_numpy(arr)
    assert M.shape == (2, 2)
    back = gbio.to_numpy(M)
    np.testing.assert_array_equal(back, arr)
    v = gbio.from_numpy(np.array([1.0, 2.0]))
    assert v.size == 2
