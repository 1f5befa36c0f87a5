"""gb.ss.iterate: whole algorithm loops as one device program.

Parity oracle: the same loop run eagerly call-by-call (reference notebook
loop shape, SURVEY §3.6)."""

import numpy as np
import pytest

import graphblas_tpu as gb


def _graph(rng, n, e):
    lin = np.unique(rng.integers(0, n * n, e))
    r, c = lin // n, lin % n
    # ring edges keep it connected
    base = np.arange(n)
    r = np.concatenate([r, base])
    c = np.concatenate([c, (base + 1) % n])
    lin = np.unique(r * n + c)
    return lin // n, lin % n


@pytest.mark.parametrize("sparse_backed", [False, True])
def test_bfs_iterate_matches_eager(rng, sparse_backed):
    n = 120
    r, c = _graph(rng, n, 700)
    kw = {"dtype": "BOOL", "nrows": n, "ncols": n}
    if sparse_backed:
        with gb.config.set(auto_sparse_limit=0):
            A = gb.Matrix.from_coo(r, c, np.ones(len(r), bool), **kw)
    else:
        A = gb.Matrix.from_coo(r, c, np.ones(len(r), bool), **kw)
    ring = gb.semiring.lor_land["BOOL"]

    # eager reference loop
    q0 = gb.Vector.from_coo([0], [True], size=n)
    lev0 = gb.Vector(gb.dtypes.INT32, n)
    d = 0
    while d < 40:
        d += 1
        lev0(mask=q0.V)[:] = d
        q0(~lev0.S, replace=True) << q0.vxm(A, ring)
        if q0.nvals == 0:
            break

    # device loop
    q = gb.Vector.from_coo([0], [True], size=n)
    lev = gb.Vector(gb.dtypes.INT32, n)

    def body(s, i):
        s["lev"](mask=s["q"].V)[:] = i
        s["q"](~s["lev"].S, replace=True) << s["q"].vxm(A, ring)

    def cond(s, i):
        return s["q"].reduce(gb.monoid.lor, allow_empty=False).new()

    iters = gb.ss.iterate(body, {"q": q, "lev": lev}, cond=cond, max_iter=40)
    assert int(iters) == d
    gi, gv = lev.to_coo()
    wi, wv = lev0.to_coo()
    assert np.array_equal(gi, wi)
    assert np.array_equal(gv, wv)


def test_iterate_fixed_count_pagerank(rng):
    n = 80
    r, c = _graph(rng, n, 500)
    outdeg = np.bincount(r, minlength=n).astype(np.float32)
    w = (1.0 / outdeg[r]).astype(np.float32)
    A = gb.Matrix.from_coo(r, c, w, dtype="FP32", nrows=n, ncols=n)
    ring = gb.semiring.plus_times["FP32"]
    damp = np.float32(0.85)
    tele = np.float32(0.15 / n)

    # eager
    rank0 = gb.Vector.from_dense(np.full(n, 1.0 / n, np.float32))
    y0 = gb.Vector(gb.dtypes.FP32, n)
    for _ in range(10):
        y0 << rank0.vxm(A, ring)
        y0 << y0.apply(gb.binary.times, right=damp)
        rank0 << y0.apply(gb.binary.plus, right=tele)

    # fused
    rank = gb.Vector.from_dense(np.full(n, 1.0 / n, np.float32))
    y = gb.Vector(gb.dtypes.FP32, n)

    def body(s, i):
        s["y"] << s["rank"].vxm(A, ring)
        s["y"] << s["y"].apply(gb.binary.times, right=damp)
        s["rank"] << s["y"].apply(gb.binary.plus, right=tele)

    iters = gb.ss.iterate(body, {"rank": rank, "y": y}, max_iter=10)
    assert int(iters) == 10
    got = rank.to_coo()[1]
    want = rank0.to_coo()[1]
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_iterate_counter_is_one_based():
    n = 8
    v = gb.Vector(gb.dtypes.INT64, n)

    def body(s, i):
        s["v"][:] = i

    iters = gb.ss.iterate(body, {"v": v}, max_iter=3)
    assert int(iters) == 3
    assert v.to_coo()[1].tolist() == [3] * n


def test_iterate_rejects_non_vector():
    with pytest.raises(TypeError, match="must be a Vector"):
        gb.ss.iterate(lambda s, i: None, {"x": 5}, max_iter=1)


def test_iterate_zero_max_iter():
    v = gb.Vector.from_dense(np.array([1.0, 2.0]))

    def body(s, i):
        s["v"][:] = 0.0

    iters = gb.ss.iterate(body, {"v": v}, max_iter=0)
    assert int(iters) == 0
    assert v.to_dict() == {0: 1.0, 1: 2.0}  # untouched


def test_iterate_do_while_runs_body_once():
    # cond is checked AFTER the body (do-while): a False cond still means
    # one executed iteration
    v = gb.Vector.from_dense(np.array([5.0]))

    def body(s, i):
        s["v"] << s["v"].apply(gb.binary.plus, right=1.0)

    def cond(s, i):
        return gb.Scalar.from_value(False)

    iters = gb.ss.iterate(body, {"v": v}, cond=cond, max_iter=10)
    assert int(iters) == 1
    assert v.to_dict() == {0: 6.0}


def test_iterate_matrix_state_msbfs(rng):
    """Fused multi-source BFS: matrix frontier state inside the device
    loop matches the eager batched loop (docs/notebooks/11)."""
    n = 60
    r, c = _graph(rng, n, 400)
    A = gb.Matrix.from_coo(r, c, np.ones(len(r), bool), dtype="BOOL",
                           nrows=n, ncols=n)
    ring = gb.semiring.lor_land["BOOL"]
    sources = [0, 7, 23]
    k = len(sources)

    def run_eager():
        Q = gb.Matrix.from_coo(range(k), sources, True, nrows=k, ncols=n)
        L = gb.Matrix(gb.dtypes.INT64, k, n)
        d = 0
        while d < 40:
            d += 1
            L(mask=Q.S)[:, :] = d
            Q(~L.S, replace=True) << Q.mxm(A, ring)
            if Q.reduce_scalar(gb.monoid.lor,
                               allow_empty=False).new().value == False:  # noqa: E712
                break
        return L

    want = run_eager()

    Q = gb.Matrix.from_coo(range(k), sources, True, nrows=k, ncols=n)
    L = gb.Matrix(gb.dtypes.INT64, k, n)

    def body(s, i):
        s["L"](mask=s["Q"].S)[:, :] = i
        s["Q"](~s["L"].S, replace=True) << s["Q"].mxm(A, ring)

    def cond(s, i):
        return s["Q"].reduce_scalar(gb.monoid.lor, allow_empty=False).new()

    gb.ss.iterate(body, {"Q": Q, "L": L}, cond=cond, max_iter=40)
    assert L.isequal(want)


def test_iterate_recaptures_mutated_operands():
    """A collection the body closes over, mutated in place between calls,
    must be re-captured — not replayed from the first trace (round-4
    advisor finding: the compiled-loop cache pinned stale closure
    constants)."""
    A = gb.Matrix.from_coo([0, 1, 2, 3], [1, 2, 3, 0], [4.0, 1.0, 2.0, 3.0],
                           nrows=4, ncols=4)
    ring = gb.semiring.plus_times["FP64"]

    def body(s, i):
        s["v"] << s["v"].vxm(A, ring)

    st = {"v": gb.Vector.from_dense(np.ones(4))}
    gb.ss.iterate(body, st, max_iter=1)
    first = st["v"].to_coo()[1]
    A << A.apply(gb.binary.times, right=10)
    st = {"v": gb.Vector.from_dense(np.ones(4))}
    gb.ss.iterate(body, st, max_iter=1)
    second = st["v"].to_coo()[1]
    assert np.allclose(np.asarray(second), 10 * np.asarray(first))


def test_iterate_cache_bounded():
    """The compiled-loop cache is a small LRU, not an unbounded pin."""
    from graphblas_tpu.ss import _ITERATE_CACHE

    for k in range(20):
        st = {"v": gb.Vector.from_dense(np.ones(4))}
        body = eval(f"lambda s, i, _k={k}: s['v'].__lshift__("
                    "s['v'].apply(gb.unary.identity))",
                    {"gb": gb})
        gb.ss.iterate(body, st, max_iter=1)
    assert len(_ITERATE_CACHE) <= 16
