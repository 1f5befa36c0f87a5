"""Level BFS as ONE device program via gb.ss.iterate.

Same algorithm as bfs_level.py, but the whole loop — masked assign,
masked lor_land vxm, and the termination reduce — compiles into a single
jax.lax.while_loop executable: zero host round-trips until the result is
read.  This is the TPU-native shape for iterative graph algorithms
(docs/user_guide/parallel.md).
"""

import graphblas_tpu as gb
from graphblas_tpu import Matrix, Vector, monoid, semiring


def main():
    A = Matrix.from_coo(
        [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1],
        [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6],
        [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4],
        name="A",
    )
    n = A.nrows
    q = Vector.from_coo([0], [True], size=n, name="frontier")
    v = Vector(gb.dtypes.INT64, n, name="level")

    def body(s, d):
        s["v"](mask=s["q"].V)[:] = d
        s["q"](~s["v"].S, replace=True) << s["q"].vxm(
            A, semiring.lor_land[bool])

    def cond(s, d):
        return s["q"].reduce(monoid.lor, allow_empty=False).new()

    depth = gb.ss.iterate(body, {"q": q, "v": v}, cond=cond, max_iter=32)

    print(f"depth: {int(depth)}")
    print("levels:", v.to_dict())
    assert v.to_dict() == {0: 1, 1: 2, 3: 2, 2: 3, 4: 3, 6: 3, 5: 4}


if __name__ == "__main__":
    main()
