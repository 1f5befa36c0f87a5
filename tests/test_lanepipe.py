"""Parity tests for the lane-aligned SpMV engine (engine/lanepipe.py).

On CPU the Pallas kernels run in interpret mode (the ``_INTERPRET`` test
hook, same pattern as test_sortpipe.py:221) so the gather/scan logic —
including the inter-block carry and the two-level split-destination path —
is exercised without TPU hardware.  Parity oracle: the dense engine.
"""

import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.core.engine import lanepipe

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


@pytest.fixture
def lane_on(monkeypatch):
    calls = []
    monkeypatch.setattr(lanepipe, "_INTERPRET", True)
    orig = lanepipe.spmv_pipeline

    def wrapper(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    monkeypatch.setattr(lanepipe, "spmv_pipeline", wrapper)
    return calls


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


def rand_vec(rng, n, dtype):
    if dtype == "BOOL":
        xv = rng.random(n) < 0.7
    elif dtype in ("INT32", "UINT32"):
        xv = rng.integers(0, 50, n)
    else:
        xv = rng.random(n).astype(np.float32)
    return gb.Vector.from_dense(np.asarray(xv), dtype=dtype)


@pytest.mark.parametrize("ring_name,dtype", SEMIRINGS)
def test_mxv_parity(rng, ring_name, dtype, lane_on):
    n = 200
    r, c, v = random_graph(rng, n, 1500, dtype)
    sp, de = both_backed(r, c, v, dtype, n)
    ring = getattr(gb.semiring, ring_name)[dtype]
    x = rand_vec(rng, n, dtype)
    got = sp.mxv(x, ring).new()
    want = de.mxv(x, ring).new()
    assert lane_on, "lanepipe was not used"
    assert got.isclose(want, rel_tol=1e-5)


@pytest.mark.parametrize("ring_name,dtype", SEMIRINGS[:4])
def test_vxm_parity(rng, ring_name, dtype, lane_on):
    n = 150
    r, c, v = random_graph(rng, n, 1200, dtype)
    sp, de = both_backed(r, c, v, dtype, n)
    ring = getattr(gb.semiring, ring_name)[dtype]
    x = rand_vec(rng, n, dtype)
    got = x.vxm(sp, ring).new()
    want = x.vxm(de, ring).new()
    assert lane_on
    assert got.isclose(want, rel_tol=1e-5)


@pytest.mark.parametrize("at", [False, True])
def test_transposed_parity(rng, at, lane_on):
    n = 120
    r, c, v = random_graph(rng, n, 900, "FP32")
    sp, de = both_backed(r, c, v, "FP32", n)
    ring = gb.semiring.plus_times["FP32"]
    x = rand_vec(rng, n, "FP32")
    A1 = sp.T if at else sp
    A2 = de.T if at else de
    got = A1.mxv(x, ring).new()
    want = A2.mxv(x, ring).new()
    assert got.isclose(want, rel_tol=1e-5)


def test_sparse_u_structure(rng, lane_on):
    """Output structure = dests with >=1 (edge AND present-u) pair."""
    n = 100
    r, c, v = random_graph(rng, n, 600, "FP32")
    sp, de = both_backed(r, c, v, "FP32", n)
    ring = gb.semiring.plus_times["FP32"]
    idx = rng.choice(n, 30, replace=False)
    x = gb.Vector.from_coo(np.sort(idx), rng.random(30).astype(np.float32),
                           size=n)
    got = sp.mxv(x, ring).new()
    want = de.mxv(x, ring).new()
    assert lane_on
    assert got.isclose(want, rel_tol=1e-5)
    gi, _ = got.to_coo()
    wi, _ = want.to_coo()
    assert np.array_equal(gi, wi)


def test_skewed_dest_two_level(rng, lane_on):
    """A destination with degree >> SPLIT_DEG exercises the second level."""
    old = lanepipe.SPLIT_DEG
    lanepipe.SPLIT_DEG = 16
    try:
        n = 64
        # column 3 receives an edge from every row -> vxm dest degree n
        r = np.concatenate([np.arange(n), np.arange(0, n, 3)])
        c = np.concatenate([np.full(n, 3), (np.arange(0, n, 3) + 1) % n])
        v = rng.random(len(r)).astype(np.float32)
        lin = np.unique(r.astype(np.int64) * n + c)
        r, c = lin // n, lin % n
        v = v[: len(r)]
        sp, de = both_backed(r, c, v, "FP32", n)
        ring = gb.semiring.plus_times["FP32"]
        x = rand_vec(rng, n, "FP32")
        got = x.vxm(sp, ring).new()
        want = x.vxm(de, ring).new()
        assert lane_on
        # the plan for dest=cols must have split col 3
        plans = sp._sparse._lanepipe_plans
        assert any(p and p["two_level"] for p in plans.values())
        assert got.isclose(want, rel_tol=1e-5)
    finally:
        lanepipe.SPLIT_DEG = old


def test_masked_vxm_bfs_step(rng, lane_on):
    """The BFS inner statement runs through the lanepipe + fused mask."""
    n = 80
    r, c, v = random_graph(rng, n, 500, "BOOL")
    sp, de = both_backed(r, c, np.ones(len(r), bool), "BOOL", n)
    ring = gb.semiring.lor_land["BOOL"]
    for A in (sp,):
        q = gb.Vector.from_coo([0], [True], size=n)
        lev = gb.Vector(gb.dtypes.INT32, n)
        qd = gb.Vector.from_coo([0], [True], size=n)
        levd = gb.Vector(gb.dtypes.INT32, n)
        for d in range(1, 6):
            lev(mask=q.V)[:] = d
            q(~lev.S, replace=True) << q.vxm(A, ring)
            levd(mask=qd.V)[:] = d
            qd(~levd.S, replace=True) << qd.vxm(de, ring)
            gi, gv = q.to_coo()
            wi, wv = qd.to_coo()
            assert np.array_equal(gi, wi), f"level {d}"
    assert lane_on


def test_plan_packing_metadata(rng):
    n = 256
    r, c, v = random_graph(rng, n, 2000, "FP32")
    d = c.astype(np.int64)
    k = r.astype(np.int64)
    plan = lanepipe.build_plan(d, k, v.astype(np.float32), n, n)
    assert plan is not None
    # every edge slot accounted: ok-count == nnz
    assert int(plan["okg"].sum()) == len(d)
    assert int(plan["oks"].sum()) == len(d)
    # route is a permutation
    assert len(np.unique(plan["route"])) == plan["L"]
    # extraction ranks distinct
    assert len(np.unique(plan["ext_rank"])) == plan["R_scan"] * 128
