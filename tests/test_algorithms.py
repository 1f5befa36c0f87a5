import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu.algorithms import (
    bfs_level,
    bfs_parent,
    connected_components,
    pagerank,
    sssp,
    triangle_count,
)

from .helpers import make_A


def _random_graph(rng, n, density=0.25, weighted=False):
    ok = rng.random((n, n)) < density
    np.fill_diagonal(ok, False)
    if weighted:
        vals = rng.integers(1, 10, size=(n, n)).astype(np.float64)
    else:
        vals = np.ones((n, n))
    r, c = np.nonzero(ok)
    return gb.Matrix.from_coo(r, c, vals[r, c], nrows=n, ncols=n), ok, vals


def _bfs_oracle(ok, source):
    import collections

    n = ok.shape[0]
    level = {source: 1}
    dq = collections.deque([source])
    while dq:
        u = dq.popleft()
        for w in np.nonzero(ok[u])[0]:
            if int(w) not in level:
                level[int(w)] = level[u] + 1
                dq.append(int(w))
    return level


def _dijkstra_oracle(ok, vals, source):
    import heapq

    n = ok.shape[0]
    dist = {source: 0.0}
    pq = [(0.0, source)]
    while pq:
        d, u = heapq.heappop(pq)
        if d > dist.get(u, np.inf):
            continue
        for w in np.nonzero(ok[u])[0]:
            nd = d + vals[u, int(w)]
            if nd < dist.get(int(w), np.inf):
                dist[int(w)] = nd
                heapq.heappush(pq, (nd, int(w)))
    return dist


def test_bfs_level_fixture():
    A = make_A()
    v = bfs_level(A, 0)
    assert v.to_dict() == {0: 1, 1: 2, 2: 3, 3: 2, 4: 3, 5: 4, 6: 3}


def test_bfs_level_random(rng):
    A, ok, _ = _random_graph(rng, 30)
    v = bfs_level(A, 0)
    assert v.to_dict() == _bfs_oracle(ok, 0)


def test_bfs_parent():
    A = make_A()
    p = bfs_parent(A, 0)
    d = p.to_dict()
    assert d[0] == 0
    # every parent is one level closer
    lev = bfs_level(A, 0).to_dict()
    for node, par in d.items():
        if node == 0:
            continue
        assert lev[par] == lev[node] - 1
        assert A[par, node].new().value is not None


def test_sssp_fixture():
    A = make_A()
    d = sssp(A, 0)
    # hand-check a few: 0->1 =2; 0->3=3; 0->4 = min(2+8, ...) = 10? or via 3->?
    oracle = _dijkstra_oracle(*(lambda vals, ok: (ok, vals))(
        A.to_dense(0), A.to_dense(0) != 0), 0)
    assert {k: float(val) for k, val in d.to_dict().items()} == oracle


def test_sssp_random(rng):
    A, ok, vals = _random_graph(rng, 25, weighted=True)
    d = sssp(A, 0)
    oracle = _dijkstra_oracle(ok, vals, 0)
    got = {k: float(v) for k, v in d.to_dict().items()}
    assert set(got) == set(oracle)
    for k in got:
        assert abs(got[k] - oracle[k]) < 1e-9


def test_pagerank_uniform_cycle():
    # ring graph: all ranks equal
    n = 8
    A = gb.Matrix.from_coo(np.arange(n), (np.arange(n) + 1) % n, 1.0)
    r, _ = pagerank(A)
    vals = r.to_coo()[1]
    np.testing.assert_allclose(vals, 1.0 / n, rtol=1e-6)
    assert abs(float(vals.sum()) - 1.0) < 1e-8


def test_pagerank_vs_networkx_style(rng):
    # compare against a straightforward numpy power iteration
    n = 20
    A, ok, _ = _random_graph(rng, n, density=0.2)
    r, _ = pagerank(A, tol=1e-12, max_iters=500)
    got = r.to_dense(0.0)
    P = ok.astype(np.float64)
    outdeg = P.sum(axis=1)
    damping = 0.85
    x = np.full(n, 1.0 / n)
    for _ in range(500):
        dangling = x[outdeg == 0].sum()
        with np.errstate(divide="ignore", invalid="ignore"):
            W = np.where(outdeg[:, None] > 0, P / np.where(outdeg[:, None] == 0, 1, outdeg[:, None]), 0)
        x_new = damping * (x @ W + dangling / n) + (1 - damping) / n
        if np.abs(x_new - x).sum() < 1e-14:
            x = x_new
            break
        x = x_new
    np.testing.assert_allclose(got, x, rtol=1e-6, atol=1e-10)


def test_connected_components(rng):
    # two separate cliques + an isolated node
    edges = [(0, 1), (1, 2), (2, 0), (3, 4)]
    r = [e[0] for e in edges]
    c = [e[1] for e in edges]
    A = gb.Matrix.from_coo(r, c, 1, nrows=6, ncols=6)
    f = connected_components(A)
    labels = f.to_dense()
    assert labels[0] == labels[1] == labels[2]
    assert labels[3] == labels[4]
    assert labels[0] != labels[3]
    assert labels[5] not in (labels[0], labels[3])


def test_connected_components_random(rng):
    n = 40
    A, ok, _ = _random_graph(rng, n, density=0.05)
    f = connected_components(A)
    labels = f.to_dense()
    # oracle: union-find over symmetrized edges
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in zip(*np.nonzero(ok | ok.T)):
        ri, rj = find(int(i)), find(int(j))
        if ri != rj:
            parent[max(ri, rj)] = min(ri, rj)
    oracle = np.array([find(i) for i in range(n)])
    # same partition: labels agree iff oracle labels agree
    for i in range(n):
        for j in range(i + 1, n):
            assert (labels[i] == labels[j]) == (oracle[i] == oracle[j])


def test_triangle_count():
    # a triangle + a pendant edge
    A = gb.Matrix.from_coo([0, 1, 2, 2], [1, 2, 0, 3], 1, nrows=4, ncols=4)
    assert triangle_count(A) == 1
    # K4 has 4 triangles
    r, c = np.nonzero(~np.eye(4, dtype=bool))
    K4 = gb.Matrix.from_coo(r, c, 1)
    assert triangle_count(K4) == 4


def test_triangle_count_random(rng):
    n = 25
    A, ok, _ = _random_graph(rng, n, density=0.3)
    sym = ok | ok.T
    # oracle: trace(S^3)/6
    S = sym.astype(np.int64)
    expected = int(np.trace(S @ S @ S) // 6)
    assert triangle_count(A) == expected
