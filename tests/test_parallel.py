import numpy as np
import pytest

import jax
import jax.numpy as jnp

import graphblas_tpu as gb
from graphblas_tpu.parallel import (
    dist_bfs_step,
    dist_mxv,
    dist_pagerank_step,
    make_blocked_csr,
    make_mesh,
    replicate,
    shard_matrix,
    shard_vector,
)


needs_8 = pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")


def _sym_graph(n, seed=0):
    rng = np.random.default_rng(seed)
    ok = rng.random((n, n)) < 0.1
    np.fill_diagonal(ok, False)
    ok = ok | ok.T
    r, c = np.nonzero(ok)
    return r, c, np.ones(len(r), np.float32), ok


@needs_8
def test_dist_mxv_matches_dense():
    mesh = make_mesh((8,), ("i",))
    n = 64
    r, c, v, ok = _sym_graph(n)
    blocked = make_blocked_csr((r, c, v, n), mesh)
    x = np.random.default_rng(1).random(n).astype(np.float32)
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P("i")))
    y, present = dist_mxv(blocked, xs, "plus_times")
    expected = ok.astype(np.float32) @ x
    np.testing.assert_allclose(np.asarray(y)[: n], expected, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(present)[:n], ok.any(axis=1))


@needs_8
def test_dist_bfs_matches_single_chip():
    mesh = make_mesh((8,), ("i",))
    n = 64
    r, c, v, ok = _sym_graph(n, seed=3)
    blocked = make_blocked_csr((r, c, v, n), mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("i"))
    frontier = jax.device_put(jnp.zeros((blocked.n,), bool).at[0].set(True), sh)
    visited = jax.device_put(jnp.zeros((blocked.n,), bool), sh)
    levels = jax.device_put(jnp.zeros((blocked.n,), jnp.int32), sh)
    d = 0
    while True:
        d += 1
        frontier, visited, levels, more = dist_bfs_step(
            blocked, frontier, visited, levels, jnp.int32(d))
        if not bool(more) or d > n:
            break
    got = np.asarray(levels)[:n]
    # oracle BFS
    import collections

    lev = np.zeros(n, np.int32)
    lev[0] = 1
    dq = collections.deque([0])
    while dq:
        u = dq.popleft()
        for w in np.nonzero(ok[u])[0]:
            if lev[w] == 0 and w != 0:
                lev[w] = lev[u] + 1
                dq.append(int(w))
    np.testing.assert_array_equal(got, lev)


@needs_8
def test_gspmd_sharded_engine_matches_unsharded():
    mesh = make_mesh((8,), ("i",))
    n = 64
    r, c, v, ok = _sym_graph(n, seed=5)
    A1 = gb.Matrix.from_coo(r, c, v.astype(np.int64), nrows=n, ncols=n)
    A2 = gb.Matrix.from_coo(r, c, v.astype(np.int64), nrows=n, ncols=n)
    shard_matrix(A2, mesh)
    x = gb.Vector.from_coo(np.arange(0, n, 3), 1, size=n)
    y1 = A1.mxv(x, gb.semiring.plus_times).new()
    y2 = A2.mxv(x, gb.semiring.plus_times).new()
    assert y1.isequal(y2)


@needs_8
def test_dist_pagerank_step():
    mesh = make_mesh((8,), ("i",))
    n = 64
    r, c, v, ok = _sym_graph(n, seed=7)
    blocked = make_blocked_csr((r, c, v, n), mesh)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sh = NamedSharding(mesh, P("i"))
    outdeg = np.bincount(r, minlength=blocked.n).astype(np.float32)
    inv = jax.device_put(
        jnp.asarray(np.where(outdeg > 0, 1 / np.maximum(outdeg, 1), 0.0),
                    dtype=jnp.float32), sh)
    rank = jax.device_put(jnp.full((blocked.n,), 1.0 / n, jnp.float32), sh)
    for _ in range(50):
        rank = dist_pagerank_step(blocked, rank, inv, jnp.float32(0.85),
                                  jnp.float32(0.15 / n))
    got = np.asarray(rank)[:n]
    # oracle power iteration (note: rank transferred along edge direction r->c)
    P_ = ok.astype(np.float64)
    deg = P_.sum(axis=1)
    x = np.full(n, 1.0 / n)
    for _ in range(50):
        x = 0.85 * ((x / np.maximum(deg, 1)) @ P_) + 0.15 / n
    np.testing.assert_allclose(got, x, rtol=1e-4)


def test_dryrun_multichip():
    import __graft_entry__ as entrymod

    ndev = min(len(jax.devices()), 8)
    if ndev < 2:
        pytest.skip("needs >=2 devices")
    entrymod.dryrun_multichip(ndev)


def test_entry_compiles():
    import __graft_entry__ as entrymod

    fn, args = entrymod.entry()
    out = jax.jit(fn)(*args)
    out.block_until_ready()
    assert out.shape == args[1].shape  # args[1] is the rank vector
    assert abs(float(out.sum()) - 1.0) < 1e-3


@needs_8
def test_dist_semiring_parity_vs_single_device():
    """shard_matrix on a sparse-backed Matrix routes mxv/vxm through the
    distributed typed-semiring kernel; parity vs the single-device engine
    for several semirings and both transposes (VERDICT r2 #5)."""
    mesh = make_mesh((8,), ("i",))
    n = 128
    rng = np.random.default_rng(5)
    lin = np.sort(rng.choice(n * n, 900, replace=False))
    r, c = lin // n, lin % n
    v = rng.random(len(r)).astype(np.float32)
    cases = [
        ("plus_times", "FP32", v, False),
        ("min_plus", "FP32", v, True),
        ("max_first", "INT64", (v * 50).astype(np.int64) + 1, True),
        ("lor_land", "BOOL", np.ones(len(r), bool), True),
    ]
    for ring_name, dt, vv, exact in cases:
        with gb.config.set(auto_sparse_limit=0):
            A = gb.Matrix.from_coo(r, c, vv, dtype=dt, nrows=n, ncols=n)
            A2 = gb.Matrix.from_coo(r, c, vv, dtype=dt, nrows=n, ncols=n)
        shard_matrix(A, mesh)
        assert A._dist is not None
        ring = getattr(gb.semiring, ring_name)
        np_dt = np.dtype(gb.dtypes.lookup_dtype(dt).np_type)
        x = gb.Vector.from_dense((rng.random(n) * 10).astype(np_dt))
        for expr_d, expr_s in [
            (A.mxv(x, ring), A2.mxv(x, ring)),
            (x.vxm(A, ring), x.vxm(A2, ring)),
            (A.T.mxv(x, ring), A2.T.mxv(x, ring)),
            (x.vxm(A.T, ring), x.vxm(A2.T, ring)),
        ]:
            got = expr_d.new()
            exp = expr_s.new()
            if exact:
                assert got.isequal(exp), (ring_name, expr_d.method_name)
            else:
                # fp reduction order differs across block partials
                assert got.isclose(exp, rel_tol=1e-4), ring_name


@needs_8
def test_dist_masked_bfs_loop_sparse():
    """The notebook BFS loop on a shard_matrix()-ed sparse adjacency ==
    the single-device result (masked assign + replace + distributed vxm)."""
    mesh = make_mesh((8,), ("i",))
    n = 96
    r, c, v, ok = _sym_graph(n, seed=3)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, np.ones(len(r), bool), nrows=n, ncols=n)
        A2 = gb.Matrix.from_coo(r, c, np.ones(len(r), bool), nrows=n, ncols=n)
    shard_matrix(A, mesh)

    def bfs(M):
        q = gb.Vector.from_coo([0], [True], size=n)
        lev = gb.Vector(gb.dtypes.INT32, n)
        d = 0
        while d <= n:
            d += 1
            lev(mask=q.V)[:] = d
            q(~lev.S, replace=True) << q.vxm(M, gb.semiring.lor_land[bool])
            if q.nvals == 0:
                break
        return lev

    assert bfs(A).isequal(bfs(A2))


# ------------------------------------------------------------------ r4:
# distribution beyond mxv/vxm (VERDICT r3 item #5)
def _r4_graph(rng, n, e):
    lin = np.unique(rng.integers(0, n * n, e))
    r, c = lin // n, lin % n
    keep = r != c
    return r[keep], c[keep]


def _r4_sharded(rng, n=64, e=600, dtype="FP32"):
    import graphblas_tpu as gb
    from graphblas_tpu.parallel import make_mesh, shard_matrix

    r, c = _r4_graph(rng, n, e)
    v = rng.random(len(r)).astype(np.float32)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, v, dtype=dtype, nrows=n, ncols=n)
        A2 = gb.Matrix.from_coo(r, c, v, dtype=dtype, nrows=n, ncols=n)
    mesh = make_mesh((8,), ("i",))
    shard_matrix(A, mesh)
    return A, A2, mesh, (r, c, v)


def test_dist_reduce_rowwise_matches(rng):
    import graphblas_tpu as gb

    A, A2, mesh, _ = _r4_sharded(rng)
    got = A.reduce_rowwise(gb.monoid.plus).new()
    want = A2.reduce_rowwise(gb.monoid.plus).new()
    assert got.isclose(want, rel_tol=1e-5)


def test_dist_reduce_columnwise_matches(rng):
    import graphblas_tpu as gb

    A, A2, mesh, _ = _r4_sharded(rng)
    got = A.reduce_columnwise(gb.monoid.max).new()
    want = A2.reduce_columnwise(gb.monoid.max).new()
    assert got.isclose(want, rel_tol=1e-5)


def test_dist_reduce_rowwise_transposed(rng):
    import graphblas_tpu as gb

    A, A2, mesh, _ = _r4_sharded(rng)
    got = A.T.reduce_rowwise(gb.monoid.plus).new()
    want = A2.T.reduce_rowwise(gb.monoid.plus).new()
    assert got.isclose(want, rel_tol=1e-5)


def test_dist_reduce_scalar_matches(rng):
    import graphblas_tpu as gb

    A, A2, mesh, _ = _r4_sharded(rng)
    got = A.reduce_scalar(gb.monoid.plus).new()
    want = A2.reduce_scalar(gb.monoid.plus).new()
    assert abs(got.value - want.value) < 1e-4 * abs(want.value)
    got_min = A.reduce_scalar(gb.monoid.min).new()
    want_min = A2.reduce_scalar(gb.monoid.min).new()
    assert got_min.isclose(want_min, rel_tol=1e-6)


def test_dist_masked_spgemm_triangle_count(rng):
    """C(L.S) << L @ L.T with plus_pair — the triangle-counting kernel —
    distributed over the 8-device mesh (VERDICT r3 item #5 done-criterion).
    """
    import graphblas_tpu as gb
    from graphblas_tpu.parallel import make_mesh, shard_matrix

    n = 64
    r, c = _r4_graph(rng, n, 800)
    # lower-triangular simple graph
    keep = r > c
    r, c = r[keep], c[keep]
    ones = np.ones(len(r), np.float32)
    with gb.config.set(auto_sparse_limit=0):
        L = gb.Matrix.from_coo(r, c, ones, dtype="FP32", nrows=n, ncols=n)
        L2 = gb.Matrix.from_coo(r, c, ones, dtype="FP32", nrows=n, ncols=n)
    mesh = make_mesh((8,), ("i",))
    shard_matrix(L, mesh)
    ring = gb.semiring.plus_pair["FP32"]
    C = gb.Matrix(gb.dtypes.FP32, n, n)
    C(L.S) << L.mxm(L.T, ring)
    C2 = gb.Matrix(gb.dtypes.FP32, n, n)
    C2(L2.S) << L2.mxm(L2.T, ring)
    tri = C.reduce_scalar(gb.monoid.plus).new().value
    tri2 = C2.reduce_scalar(gb.monoid.plus).new().value
    assert tri == tri2
    assert C.isequal(C2)


def test_dist_spgemm_fallback_is_recorded(rng):
    import graphblas_tpu as gb

    A, A2, mesh, _ = _r4_sharded(rng)
    with gb.Recorder() as rec:
        # unmasked mxm has no distributed kernel: must fall back loudly
        (A.mxm(A.T, gb.semiring.plus_times["FP32"])).new()
    assert any("fallback: single-device SpGEMM" in line for line in rec.data)


def test_dist_positional_fallback_is_recorded(rng):
    import graphblas_tpu as gb

    A, A2, mesh, _ = _r4_sharded(rng)
    x = gb.Vector.from_dense(np.ones(A.nrows, np.float32))
    with gb.Recorder() as rec:
        A.mxv(x, gb.semiring.ss.min_firsti).new()
    assert any("positional semiring" in line for line in rec.data)


def test_dist_ewise_blocked_same_structure(rng):
    import graphblas_tpu as gb
    from graphblas_tpu.parallel import ewise_blocked, make_mesh, shard_matrix

    n = 64
    r, c = _r4_graph(rng, n, 500)
    v1 = rng.random(len(r)).astype(np.float32)
    v2 = rng.random(len(r)).astype(np.float32)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, v1, dtype="FP32", nrows=n, ncols=n)
    B = gb.Matrix(gb.dtypes.FP32, n, n)
    B << A.apply(gb.binary.times, right=np.float32(2.0))  # same structure
    mesh = make_mesh((8,), ("i",))
    shard_matrix(A, mesh)
    B._dist = None
    shard_matrix(B, mesh)
    C = ewise_blocked(A, B, gb.binary.plus)
    assert C._dist is not None
    want = A.ewise_mult(B, gb.binary.plus).new()
    assert C.isclose(want, rel_tol=1e-6)
    # the blocked values drive a distributed reduce directly
    got = C.reduce_scalar(gb.monoid.plus).new().value
    assert abs(got - want.reduce_scalar(gb.monoid.plus).new().value) < 1e-3


def test_dist_select_keeps_distribution(rng):
    """B = A.select(op) on a sharded A stays sharded: the predicate is
    evaluated per block (global row ids for positional ops, no
    communication) and gates the blocked edge validity."""
    import graphblas_tpu as gb

    A, A2, mesh, _ = _r4_sharded(rng)
    # value-family predicate
    B = A.select(gb.select.valuegt, 0.5).new()
    assert getattr(B, "_dist", None) is not None
    want = A2.select(gb.select.valuegt, 0.5).new()
    assert B.isclose(want, rel_tol=1e-6)
    # block-local vs global row ids: triu crosses block boundaries
    C = A.select(gb.select.triu).new()
    assert getattr(C, "_dist", None) is not None
    wantC = A2.select(gb.select.triu).new()
    assert C.isclose(wantC, rel_tol=1e-6)
    # the attached distribution is live: per-device shard shape and a
    # distributed reduce off the blocked values
    assert C._dist.rowids.shape[0] == 8
    got = C.reduce_scalar(gb.monoid.plus).new().value
    assert abs(got - wantC.reduce_scalar(gb.monoid.plus).new().value) < 1e-3


def test_dist_apply_keeps_distribution(rng):
    """B = A.apply(op) on a sharded A is itself sharded (structure-
    preserving transform over the blocked values, parallel-free)."""
    import graphblas_tpu as gb

    A, A2, mesh, _ = _r4_sharded(rng)
    B = A.apply(gb.unary.ainv).new()
    assert getattr(B, "_dist", None) is not None
    want = A2.apply(gb.unary.ainv).new()
    assert B.isclose(want, rel_tol=1e-6)
    # and the attached distribution drives a distributed reduce
    got = B.reduce_scalar(gb.monoid.plus).new().value
    assert abs(got - want.reduce_scalar(gb.monoid.plus).new().value) < 1e-3


def test_dist_2d_mesh(rng):
    """A 2-D mesh works: row-blocks shard over the first axis, replicate
    over the rest; collectives ride the first axis only."""
    import graphblas_tpu as gb
    from graphblas_tpu.parallel import make_mesh, shard_matrix

    n = 64
    r, c = _r4_graph(rng, n, 600)
    v = rng.random(len(r)).astype(np.float32)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, v, dtype="FP32", nrows=n, ncols=n)
        A2 = gb.Matrix.from_coo(r, c, v, dtype="FP32", nrows=n, ncols=n)
    mesh = make_mesh((4, 2), ("i", "j"))
    shard_matrix(A, mesh)
    x = gb.Vector.from_dense(rng.random(n).astype(np.float32))
    assert A.mxv(x, gb.semiring.plus_times["FP32"]).new().isclose(
        A2.mxv(x, gb.semiring.plus_times["FP32"]).new(), rel_tol=1e-5)
    assert A.reduce_columnwise(gb.monoid.plus).new().isclose(
        A2.reduce_columnwise(gb.monoid.plus).new(), rel_tol=1e-5)


def test_dist_spgemm_sharded_b_triangle_count(rng):
    """Triangle counting with B sharded too: the rotation kernel keeps one
    B row block per device (round-4 VERDICT item #6 done-criterion) and
    matches the single-device result."""
    import graphblas_tpu as gb
    from graphblas_tpu.parallel import make_mesh, shard_matrix

    n = 64
    r, c = _r4_graph(rng, n, 800)
    keep = r > c
    r, c = r[keep], c[keep]
    ones = np.ones(len(r), np.float32)
    with gb.config.set(auto_sparse_limit=0):
        L = gb.Matrix.from_coo(r, c, ones, dtype="FP32", nrows=n, ncols=n)
        L2 = gb.Matrix.from_coo(r, c, ones, dtype="FP32", nrows=n, ncols=n)
    mesh = make_mesh((8,), ("i",))
    shard_matrix(L, mesh)
    # memory-shape assertion: every device holds exactly ONE of the 8 row
    # blocks of L (so no device materializes all of B in the rotation)
    for arr in (L._dist.rowids, L._dist.cols, L._dist.edge_ok):
        shard_rows = {s.data.shape[0] for s in arr.addressable_shards}
        assert shard_rows == {1}, shard_rows
    ring = gb.semiring.plus_pair["FP32"]
    C = gb.Matrix(gb.dtypes.FP32, n, n)
    with gb.Recorder() as rec:
        C(L.S) << L.mxm(L.T, ring)
    assert any("sharded-B rotation SpGEMM" in line for line in rec.data), \
        rec.data
    C2 = gb.Matrix(gb.dtypes.FP32, n, n)
    C2(L2.S) << L2.mxm(L2.T, ring)
    assert C.isequal(C2)
    assert (C.reduce_scalar(gb.monoid.plus).new().value
            == C2.reduce_scalar(gb.monoid.plus).new().value)


def test_dist_spgemm_mask_redistribution(rng):
    """An undistributed mask no longer forces the single-device fallback:
    it is redistributed to A's row blocks (round-4 VERDICT item #6)."""
    import graphblas_tpu as gb
    from graphblas_tpu.parallel import make_mesh, shard_matrix

    n = 48
    r, c = _r4_graph(rng, n, 500)
    v = rng.random(len(r)).astype(np.float32)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, v, dtype="FP32", nrows=n, ncols=n)
        A2 = gb.Matrix.from_coo(r, c, v, dtype="FP32", nrows=n, ncols=n)
        # a separate mask matrix, never sharded by the user
        M = gb.Matrix.from_coo(r[::2], c[::2], np.ones(len(r[::2]), bool),
                               dtype="BOOL", nrows=n, ncols=n)
        M2 = gb.Matrix.from_coo(r[::2], c[::2], np.ones(len(r[::2]), bool),
                                dtype="BOOL", nrows=n, ncols=n)
    mesh = make_mesh((8,), ("i",))
    shard_matrix(A, mesh)
    ring = gb.semiring.plus_times["FP32"]
    C = gb.Matrix(gb.dtypes.FP32, n, n)
    with gb.Recorder() as rec:
        C(M.S) << A.mxm(A, ring)
    assert any("mask redistributed" in line for line in rec.data), rec.data
    assert M._dist is not None
    C2 = gb.Matrix(gb.dtypes.FP32, n, n)
    C2(M2.S) << A2.mxm(A2, ring)
    assert C.isclose(C2, rel_tol=1e-5)


def test_dist_extract_submatrix(rng):
    """A[rows, cols] on a distributed matrix runs the per-row-block
    extract (round-4 VERDICT item #6: distributed extract)."""
    import graphblas_tpu as gb
    from graphblas_tpu.parallel import make_mesh, shard_matrix

    n = 64
    r, c = _r4_graph(rng, n, 900)
    v = rng.random(len(r)).astype(np.float32)
    with gb.config.set(auto_sparse_limit=0):
        A = gb.Matrix.from_coo(r, c, v, dtype="FP32", nrows=n, ncols=n)
        A2 = gb.Matrix.from_coo(r, c, v, dtype="FP32", nrows=n, ncols=n)
    mesh = make_mesh((8,), ("i",))
    shard_matrix(A, mesh)
    rows = np.arange(5, 40)
    cols = np.arange(0, 64, 2)
    with gb.Recorder() as rec:
        S = A[rows, cols].new()
    assert any("extract distributed" in line for line in rec.data), rec.data
    S2 = A2[rows, cols].new()
    assert S.isequal(S2)
    # row/col slices through the same path
    with gb.config.set(auto_sparse_limit=0):
        pass
    S3 = A[10:50, :].new()
    S4 = A2[10:50, :].new()
    assert S3.isequal(S4)
