"""Bisect the scale at which BOOL vxm goes empty: vary n and cap independently."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_graph  # noqa: E402

import graphblas_tpu as gb  # noqa: E402
import scipy.sparse as sp  # noqa: E402

n = int(os.environ.get("N", 1 << 17))
deg = int(os.environ.get("DEG", 8))
src, dst = build_graph(n, deg)
nnz = len(src)

with gb.config.set(auto_sparse_limit=0):
    Ab = gb.Matrix.from_coo(src, dst, np.ones(nnz, bool), dtype="BOOL",
                            nrows=n, ncols=n)
cap = Ab._sparse.cap
print(f"n={n} nnz={nnz} cap={cap}", flush=True)
lor_land = gb.semiring.lor_land["BOOL"]
q = gb.Vector.from_coo([0], [True], size=n)
f = q.vxm(Ab, lor_land).new()
A = sp.coo_matrix((np.ones(nnz), (src, dst)), shape=(n, n)).tocsr()
exp = len(A[0].indices)
print(f"frontier nvals={f.nvals} expected={exp}",
      "OK" if f.nvals == exp else "FAIL", flush=True)
