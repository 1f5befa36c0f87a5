"""Connected components via FastSV hook/shortcut phases
(reference notebook: Connected Components -- FastSV.ipynb)."""

import numpy as np

import graphblas_tpu as gb
from graphblas_tpu.algorithms import connected_components


def main():
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (5, 6), (6, 7)]
    r = [e[0] for e in edges]
    c = [e[1] for e in edges]
    A = gb.Matrix.from_coo(r, c, 1, nrows=9, ncols=9)
    labels = connected_components(A)
    print("labels:", labels.to_dense().tolist())
    # {0,1,2} {3,4} {5,6,7} {8}
    lab = labels.to_dense()
    assert lab[0] == lab[1] == lab[2]
    assert lab[3] == lab[4] != lab[0]
    assert lab[5] == lab[6] == lab[7]


if __name__ == "__main__":
    main()
