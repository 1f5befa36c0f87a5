"""Breadth-first search (reference: notebooks/Example B.1 -- Level BFS.ipynb
and the BFS-parents notebook).

Per iteration: masked dense assign + masked any_pair vxm + lor reduce —
3 fused kernel launches, the BASELINE.json config #1 inner loop (SURVEY §3.6).
"""

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, monoid, semiring


def bfs_level(A, source=0):
    """Level of each reachable node (source has level 1).

    Returns an INT64 Vector; unreachable nodes have no entry.
    """
    n = A.nrows
    v = Vector(dtypes.INT64, n, name="level")
    q = Vector(dtypes.BOOL, n, name="frontier")
    q[source] = True
    ring = semiring.lor_land[bool]
    d = 0
    while True:
        d += 1
        v(mask=q.V)[:] = d
        q(~v.S, replace=True) << q.vxm(A, ring)
        if not q.reduce(monoid.lor, allow_empty=False).new().value:
            break
    return v


def bfs_parent(A, source=0):
    """Parent of each reachable node in a BFS tree (source is its own parent).

    Uses the min_secondi positional semiring over the frontier, as in the
    reference BFS-parents notebook.
    """
    n = A.nrows
    parent = Vector(dtypes.INT64, n, name="parent")
    parent[source] = source
    q = Vector(dtypes.INT64, n, name="frontier")
    q[source] = source
    ring = semiring.ss.min_secondi
    while True:
        # propagate the index of the frontier node along its out-edges:
        # secondi(q[k], A[k, j]) == k, min-reduced over the frontier
        q(~parent.S, replace=True) << q.vxm(A, ring)
        if q.nvals == 0:
            break
        parent(q.S) << q
    return parent
