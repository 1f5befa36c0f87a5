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


def test_scipy_formats_roundtrip():
    # reference test_io.py scipy format coverage
    import scipy.sparse as ss

    r = [0, 0, 1, 2]
    c = [1, 2, 0, 2]
    v = [1.0, 2.0, 3.0, 4.0]
    A = gb.Matrix.from_coo(r, c, v, nrows=3, ncols=3)
    for fmt in ["csr", "csc", "coo"]:
        S = gb.io.to_scipy_sparse(A, format=fmt)
        assert S.format == fmt
        A2 = gb.io.from_scipy_sparse(S)
        assert A2.isequal(A)


def test_mmwrite_field_and_comment(tmp_path):
    import pathlib

    A = gb.Matrix.from_coo([0, 1], [1, 0], [1.5, 2.5], nrows=2, ncols=2)
    path = tmp_path / "x.mtx"
    gb.io.mmwrite(path, A, comment="hello")
    text = pathlib.Path(path).read_text()
    assert text.startswith("%%MatrixMarket")
    assert "hello" in text
    A2 = gb.io.mmread(path)
    assert A2.isclose(A)


def test_networkx_weighted_digraph():
    import networkx as nx

    G = nx.DiGraph()
    G.add_weighted_edges_from([(0, 1, 2.0), (1, 2, 3.0), (2, 0, 4.0)])
    A = gb.io.from_networkx(G, nodelist=[0, 1, 2])
    assert A[0, 1].new().value == 2.0
    G2 = gb.io.to_networkx(A)
    assert G2[0][1]["weight"] == 2.0
    assert G2[2][0]["weight"] == 4.0


def test_pydata_sparse_roundtrip():
    sparse = pytest.importorskip("sparse")
    r = np.array([0, 1])
    c = np.array([1, 0])
    v = np.array([5.0, 6.0])
    s = sparse.COO((r, c), v, shape=(2, 2))
    A = gb.io.from_pydata_sparse(s)
    assert A[0, 1].new().value == 5.0
    s2 = gb.io.to_pydata_sparse(A)
    assert (s2.todense() == s.todense()).all()


def test_awkward_roundtrip():
    ak = pytest.importorskip("awkward")
    A = gb.Matrix.from_coo([0, 1], [1, 0], [1.0, 2.0], nrows=2, ncols=2)
    a = gb.io.to_awkward(A)
    A2 = gb.io.from_awkward(a)
    assert A2.isequal(A)


def test_vector_io_roundtrips():
    import scipy.sparse as ss

    v = gb.Vector.from_coo([1, 3], [1.5, 2.5], size=5)
    d = v.to_dense(fill_value=0.0)
    v2 = gb.Vector.from_dense(d)
    # from_dense makes every slot present; the values at v's slots agree
    assert v2[1].new().value == 1.5
    assert v2[3].new().value == 2.5
