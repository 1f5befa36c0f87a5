"""Connected components via FastSV (reference: notebooks/Connected
Components -- FastSV.ipynb): hook/shortcut phases over min_select semirings,
assign/extract-heavy.
"""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, dtypes, monoid, semiring


def connected_components(A):
    """Component label (minimum reachable vertex id) per vertex.

    A is treated as undirected: edges are symmetrized internally.
    Returns an INT64 dense Vector of labels.
    """
    n = A.nrows
    # symmetrize pattern
    S = A.dup(dtype=dtypes.BOOL)
    S(accum=binary.lor) << A.T.new(dtype=dtypes.BOOL)
    f = Vector.from_dense(np.arange(n, dtype=np.int64), name="parent")
    ring = semiring.min_second
    while True:
        prev = f.dup()
        # hook: f[i] = min(f[i], min over neighbors j of f[j])
        mngp = S.mxv(f, ring).new(name="mngp")
        f(accum=binary.min) << mngp
        # shortcut: f[i] = f[f[i]] (pointer jumping)
        for _ in range(2):
            parents = f.to_coo()[1].astype(np.int64)
            f(accum=binary.min) << f[parents]
        if f.isequal(prev):
            break
    return f
