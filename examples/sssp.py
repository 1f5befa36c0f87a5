"""SSSP via the min_plus semiring with accum=min
(reference notebook: Intro to GraphBLAS + SSSP example.ipynb)."""

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, binary, semiring


def main():
    A = Matrix.from_coo(
        [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1],
        [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6],
        [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4],
    )
    n = A.nrows
    d = Vector(A.dtype, n, name="dist")
    d[0] = 0
    while True:
        prev = d.dup()
        d(accum=binary.min) << d.vxm(A, semiring.min_plus)
        if d.isequal(prev):
            break
    print("distances:", d.to_dict())

    from graphblas_tpu.algorithms import sssp

    assert sssp(A, 0).isequal(d)


if __name__ == "__main__":
    main()
