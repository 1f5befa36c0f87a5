"""Triangle counting with a masked plus_pair SpGEMM (C<L> = L @ L.T)
(reference notebook: Louvain.ipynb / HPEC pattern)."""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu.algorithms import triangle_count


def main():
    rng = np.random.default_rng(1)
    n = 60
    ok = rng.random((n, n)) < 0.15
    np.fill_diagonal(ok, False)
    r, c = np.nonzero(ok)
    A = gb.Matrix.from_coo(r, c, 1, nrows=n, ncols=n)
    t = triangle_count(A)
    sym = (ok | ok.T).astype(np.int64)
    expected = int(np.trace(sym @ sym @ sym) // 6)
    print(f"triangles: {t} (oracle {expected})")
    assert t == expected


if __name__ == "__main__":
    main()
