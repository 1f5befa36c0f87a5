"""PageRank: plus_times SpMV iteration with apply/reduce
(reference notebook: Pagerank Demo.ipynb)."""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu.algorithms import pagerank


def main():
    rng = np.random.default_rng(0)
    n = 50
    ok = rng.random((n, n)) < 0.1
    np.fill_diagonal(ok, False)
    r, c = np.nonzero(ok)
    A = gb.Matrix.from_coo(r, c, 1.0, nrows=n, ncols=n)
    rank, iters = pagerank(A, tol=1e-10)
    top = sorted(rank.to_dict().items(), key=lambda kv: -kv[1])[:5]
    print(f"converged in {iters} iterations; top-5:")
    for node, score in top:
        print(f"  node {node}: {score:.5f}")
    assert abs(sum(rank.to_dict().values()) - 1.0) < 1e-6


if __name__ == "__main__":
    main()
