import numpy as np
import graphblas_tpu as gb
from graphblas_tpu import binary, semiring

gb.config["auto_sparse_limit"] = 1  # force sparse backing everywhere

# A[0,0]=1, A[0,1]=1 ; B[0,2]=1, B[1,2]=1  => C = A@B : C[0,2] = 2 (two products)
A = gb.Matrix.from_coo([0, 0], [0, 1], [1.0, 1.0], nrows=3, ncols=3)
B = gb.Matrix.from_coo([0, 1], [2, 2], [1.0, 1.0], nrows=3, ncols=3)
assert A._sparse is not None

C = A.mxm(B, semiring.plus_times).new()
assert C._sparse is not None
print("C store cap:", C._sparse.cap, "nvals:", C.nvals)
print("to_coo:", C.to_coo())

s = C[0, 2].new()
print("C[0,2].value =", s.value, " (expected 2.0)")

# C used as a structural mask over a full matrix
D = gb.Matrix.from_coo([0, 1, 2], [0, 1, 2], [7.0, 7.0, 7.0], nrows=3, ncols=3)
E = gb.Matrix.from_coo(np.repeat(np.arange(3), 3), np.tile(np.arange(3), 3),
                       np.ones(9), nrows=3, ncols=3)
F = E.ewise_mult(E, binary.times).new(mask=C.S)
print("masked to_coo:", F.to_coo(), " (expected entry at (0,2))")
