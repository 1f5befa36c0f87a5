"""Triangle counting (reference: notebooks/Louvain.ipynb and the HPEC
masked-SpGEMM pattern): count = sum(C<L> = L plus_pair L) where L is the
strictly-lower-triangular part of the symmetrized adjacency.
"""

import graphblas_tpu as gb
from graphblas_tpu import Matrix, binary, dtypes, monoid, select, semiring


def triangle_count(A):
    """Number of triangles in the undirected graph of A (pattern only)."""
    S = A.apply(gb.unary.one).new(dtype=dtypes.INT64)
    S(accum=binary.max) << A.T.new(dtype=dtypes.INT64).apply(gb.unary.one)
    L = S.select(select.tril, -1).new(name="L")
    C = gb.Matrix(dtypes.INT64, L.nrows, L.ncols)
    C(L.S) << L.mxm(L.T, semiring.plus_pair)
    s = C.reduce_scalar(monoid.plus, allow_empty=False).new()
    return int(s.value)
