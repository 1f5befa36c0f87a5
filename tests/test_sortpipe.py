"""Parity tests for the sort-pipeline SpMV engine (engine/sortpipe.py).

The pipeline is the hot path for mxv/vxm/reduce over 32-bit dtypes with
builtin monoids; these tests pin it against the dense engine on random
graphs, across semirings, transposes, masks, and sparse vectors.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core.engine import sortpipe

SEMIRINGS = [
    ("plus_times", "FP32"),
    ("plus_times", "INT32"),
    ("min_plus", "FP32"),
    ("max_times", "FP32"),
    ("lor_land", "BOOL"),
    ("plus_pair", "INT32"),
    ("min_first", "FP32"),
    ("band_bor", "UINT32"),
]


def random_graph(rng, n, e, dtype):
    lin = np.sort(rng.choice(n * n, min(e, n * n), replace=False))
    r, c = lin // n, lin % n
    if dtype == "BOOL":
        v = rng.random(len(r)) < 0.8
    elif dtype in ("INT32", "UINT32"):
        v = rng.integers(1, 100, len(r))
    else:
        v = rng.random(len(r)).astype(np.float32)
    return r, c, v


def both_backed(r, c, v, dtype, n):
    with gb.config.set(auto_sparse_limit=0):
        sp = gb.Matrix.from_coo(r, c, v, dtype=dtype, nrows=n, ncols=n)
    assert sp._sparse is not None
    de = gb.Matrix.from_coo(r, c, v, dtype=dtype, nrows=n, ncols=n)
    if de._sparse is not None:
        de._densify()
    return sp, de


@pytest.fixture
def spy(monkeypatch):
    calls = []
    orig = sortpipe.spmv_pipeline

    def wrapper(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(sortpipe, "spmv_pipeline", wrapper)
    return calls


@pytest.mark.parametrize("ring_name,dtype", SEMIRINGS)
def test_mxv_parity(rng, ring_name, dtype, spy):
    n = 200
    r, c, v = random_graph(rng, n, 1500, dtype)
    sp, de = both_backed(r, c, v, dtype, n)
    ring = getattr(gb.semiring, ring_name)[dtype]
    if dtype == "BOOL":
        xv = rng.random(n) < 0.7
    elif dtype in ("INT32", "UINT32"):
        xv = rng.integers(0, 50, n)
    else:
        xv = rng.random(n).astype(np.float32)
    x = gb.Vector.from_dense(np.asarray(xv), dtype=dtype)
    got = sp.mxv(x, ring).new()
    want = de.mxv(x, ring).new()
    assert spy, "sort pipeline was not used"
    assert got.isclose(want, rel_tol=1e-5)


@pytest.mark.parametrize("ring_name,dtype", SEMIRINGS[:4])
def test_vxm_transpose_parity(rng, ring_name, dtype, spy):
    n = 150
    r, c, v = random_graph(rng, n, 1200, dtype)
    sp, de = both_backed(r, c, v, dtype, n)
    ring = getattr(gb.semiring, ring_name)[dtype]
    xv = (rng.random(n).astype(np.float32) if dtype == "FP32"
          else rng.integers(0, 50, n))
    x = gb.Vector.from_dense(np.asarray(xv), dtype=dtype)
    got = x.vxm(sp, ring).new()
    want = x.vxm(de, ring).new()
    assert got.isclose(want, rel_tol=1e-5)
    gt = sp.T.mxv(x, ring).new()
    wt = de.T.mxv(x, ring).new()
    assert spy
    assert gt.isclose(wt, rel_tol=1e-5)


def test_sparse_vector_operand(rng, spy):
    """Missing u entries must not produce products (fill validity)."""
    n = 300
    r, c, v = random_graph(rng, n, 2000, "FP32")
    sp, de = both_backed(r, c, v, "FP32", n)
    idx = np.unique(rng.choice(n, 40))
    x = gb.Vector.from_coo(idx, rng.random(len(idx)).astype(np.float32),
                           size=n)
    got = sp.mxv(x, gb.semiring.plus_times).new()
    want = de.mxv(x, gb.semiring.plus_times).new()
    assert spy
    assert got.isclose(want, rel_tol=1e-5)
    # structure must match exactly (rows with no valid product are empty)
    gi = got.to_coo()[0]
    wi = want.to_coo()[0]
    assert np.array_equal(gi, wi)


def test_masked_replace_accum(rng, spy):
    n = 120
    r, c, v = random_graph(rng, n, 900, "FP32")
    sp, de = both_backed(r, c, v, "FP32", n)
    x = gb.Vector.from_dense(rng.random(n).astype(np.float32))
    midx = np.unique(rng.choice(n, 50))
    m = gb.Vector.from_coo(midx, np.ones(len(midx), bool), size=n)
    ring = gb.semiring.plus_times["FP32"]
    for mask, accum, replace in [
        (m.S, None, False), (~m.S, None, True), (m.V, gb.binary.plus, False),
    ]:
        g = gb.Vector(gb.dtypes.FP32, n)
        g[:] = 1.0
        w = gb.Vector(gb.dtypes.FP32, n)
        w[:] = 1.0
        g(mask=mask, accum=accum, replace=replace) << sp.mxv(x, ring)
        w(mask=mask, accum=accum, replace=replace) << de.mxv(x, ring)
        assert g.isclose(w, rel_tol=1e-5)
    assert spy


def test_reduce_parity(rng):
    n = 250
    for dtype, mono in [("FP32", "plus"), ("INT32", "min"), ("FP32", "max"),
                        ("BOOL", "lor")]:
        r, c, v = random_graph(rng, n, 1800, dtype)
        sp, de = both_backed(r, c, v, dtype, n)
        m = getattr(gb.monoid, mono)
        for meth in ("reduce_rowwise", "reduce_columnwise"):
            got = getattr(sp, meth)(m).new()
            want = getattr(de, meth)(m).new()
            assert got.isclose(want, rel_tol=1e-6), (dtype, mono, meth)


def test_bfs_loop_parity(rng):
    """Full level-BFS on both backings (the notebook acceptance loop)."""
    n = 400
    r, c, v = random_graph(rng, n, 2500, "BOOL")
    # symmetrize
    r2 = np.concatenate([r, c])
    c2 = np.concatenate([c, r])
    lin = np.unique(r2 * n + c2)
    r2, c2 = lin // n, lin % n
    sp, de = both_backed(r2, c2, np.ones(len(r2), bool), "BOOL", n)

    def bfs(A):
        q = gb.Vector.from_coo([0], [True], size=n)
        lev = gb.Vector(gb.dtypes.INT64, n)
        d = 0
        while True:
            d += 1
            lev(mask=q.V)[:] = d
            q(~lev.S, replace=True) << q.vxm(A, gb.semiring.lor_land["BOOL"])
            if q.nvals == 0 or d > n:
                break
        return lev

    a = bfs(sp)
    b = bfs(de)
    assert a.isequal(b)


def test_large_random_sweep(rng):
    """Randomized size sweep incl. >10k rows (VERDICT weak #7)."""
    for _ in range(3):
        n = int(rng.integers(1000, 20000))
        e = int(rng.integers(n, 6 * n))
        r, c, v = random_graph(rng, n, e, "FP32")
        with gb.config.set(auto_sparse_limit=0):
            A = gb.Matrix.from_coo(r, c, v, dtype="FP32", nrows=n, ncols=n)
        x = rng.random(n).astype(np.float32)
        got = A.mxv(gb.Vector.from_dense(x), gb.semiring.plus_times).new()
        oracle = np.zeros(n)
        np.add.at(oracle, r, v.astype(np.float64) * x[c])
        dense_out = np.asarray(got.to_dense(fill_value=0), np.float64)
        assert np.allclose(dense_out, oracle, rtol=1e-4, atol=1e-6)


def test_pallas_segscan_interpret_block_carry():
    """Pallas segscan on CPU (interpret mode): segments crossing the 32768-
    element grid-block boundary must carry values across blocks.  Regression
    for the round-3 bug where every grid block scanned independently."""
    import jax
    import jax.numpy as jnp

    L = 1 << 16  # 2 grid blocks of BR*BC = 256*128
    rng = np.random.default_rng(7)
    barrier = (rng.random(L) < 0.001).astype(np.int32)
    barrier[0] = 1
    # force a long segment across the block boundary
    barrier[20000:40000] = 0
    vals = rng.integers(0, 100, L).astype(np.int32)

    def ref(barrier, vals):
        out = np.empty_like(vals)
        acc = 0
        for i in range(len(vals)):
            acc = vals[i] if barrier[i] else acc + vals[i]
            out[i] = acc
        return out

    comb = (lambda a, b: a + b,)
    old = sortpipe._INTERPRET
    sortpipe._INTERPRET = True
    try:
        with jax.enable_x64(False):
            got = jax.jit(lambda b, v: sortpipe._segscan_pallas(b, [v], comb)[0])(
                jnp.asarray(barrier), jnp.asarray(vals))
    finally:
        sortpipe._INTERPRET = old
    assert np.array_equal(np.asarray(got), ref(barrier, vals))
