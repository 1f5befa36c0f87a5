"""Level BFS (reference notebook: Example B.1 -- Level BFS.ipynb).

Per iteration: masked dense assign + masked lor_land vxm + lor reduce.
"""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, monoid, semiring


def main():
    #    0 1 2 3 4 5 6
    # 0 [- 2 - 3 - - -]   (the 7-node graph of the reference tests)
    A = Matrix.from_coo(
        [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1],
        [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6],
        [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4],
        name="A",
    )
    n = A.nrows
    q = Vector.from_coo([0], [True], size=n, name="frontier")
    v = Vector(gb.dtypes.INT64, n, name="level")

    d = 0
    while True:
        d += 1
        v(mask=q.V)[:] = d
        q(~v.S, replace=True) << q.vxm(A, semiring.lor_land[bool])
        if not q.reduce(monoid.lor, allow_empty=False).new().value:
            break

    print("levels:", v.to_dict())
    # library version of the same loop:
    from graphblas_tpu.algorithms import bfs_level

    assert bfs_level(A, 0).isequal(v)


if __name__ == "__main__":
    main()
