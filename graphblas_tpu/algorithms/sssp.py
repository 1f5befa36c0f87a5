"""Single-source shortest paths (reference: notebooks/Intro to GraphBLAS +
SSSP example.ipynb): Bellman-Ford iteration `d(min) << d.vxm(A, min_plus)`.
"""

import graphblas_tpu as gb
from graphblas_tpu import Vector, binary, dtypes, monoid, semiring


def sssp(A, source=0, *, max_iters=None):
    """Shortest-path distances from source over the min_plus semiring.

    Works for any numeric edge-weight dtype; returns distances as a Vector
    (no entry = unreachable).
    """
    n = A.nrows
    dt = A.dtype
    d = Vector(dt, n, name="dist")
    d[source] = 0
    ring = semiring.min_plus
    iters = n if max_iters is None else max_iters
    for _ in range(iters):
        prev = d.dup()
        d(accum=binary.min) << d.vxm(A, ring)
        if d.isequal(prev):
            break
    return d
