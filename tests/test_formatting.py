"""Golden-output repr tests (reference graphblas/tests/test_formatting.py).

The reference pins reprs with a 5088-line golden suite; these goldens pin the
same layout for our renderer.  Header lines are byte-identical to the
reference goldens (test_formatting.py:150-260); grids use our (pandas-free)
cell spacing.
"""

import graphblas_tpu as gb


def _A():
    # golden reprs pin the format column: force the bitmap backing so the
    # suite also passes under `pytest --force-sparse`
    with gb.config.set(auto_sparse_limit=1 << 62):
        return gb.Matrix.from_coo([0, 0, 0], [0, 2, 4], [0, 1, 2],
                                  nrows=1, ncols=5, name="A_1")


def _B():
    with gb.config.set(auto_sparse_limit=1 << 62):
        return gb.Matrix.from_coo([0, 2, 4], [0, 0, 0], [10, 20, 30],
                                  nrows=5, ncols=1, name="B_1")


def test_matrix_repr_small():
    assert repr(_A()) == (
        '"A_1"      nvals  nrows  ncols  dtype   format\n'
        "gb.Matrix      3      1      5  INT64  bitmapr\n"
        "----------------------------------------------\n"
        "   0  1  2  3  4\n"
        "0  0     1     2"
    )
    assert repr(_B()) == (
        '"B_1"      nvals  nrows  ncols  dtype   format\n'
        "gb.Matrix      3      5      1  INT64  bitmapr\n"
        "----------------------------------------------\n"
        "    0\n"
        "0  10\n"
        "1    \n"
        "2  20\n"
        "3    \n"
        "4  30"
    )


def test_transposed_repr():
    assert repr(_B().T) == (
        '"B_1.T"              nvals  nrows  ncols  dtype   format\n'
        "gb.TransposedMatrix      3      1      5  INT64  bitmapc\n"
        "--------------------------------------------------------\n"
        "    0  1   2  3   4\n"
        "0  10     20     30"
    )


def test_matrix_mask_repr_small():
    A = _A()
    assert repr(A.S) == (
        '"A_1.S"         nvals  nrows  ncols  dtype   format\n'
        "StructuralMask\n"
        "of gb.Matrix        3      1      5  INT64  bitmapr\n"
        "---------------------------------------------------\n"
        "   0  1  2  3  4\n"
        "0  1     1     1"
    )
    assert repr(A.V) == (
        '"A_1.V"       nvals  nrows  ncols  dtype   format\n'
        "ValueMask\n"
        "of gb.Matrix      3      1      5  INT64  bitmapr\n"
        "-------------------------------------------------\n"
        "   0  1  2  3  4\n"
        "0  0     1     1"
    )
    assert repr(~A.S) == (
        '"~A_1.S"                    nvals  nrows  ncols  dtype   format\n'
        "ComplementedStructuralMask\n"
        "of gb.Matrix                    3      1      5  INT64  bitmapr\n"
        "---------------------------------------------------------------\n"
        "   0  1  2  3  4\n"
        "0  0     0     0"
    )
    assert repr(~A.V) == (
        '"~A_1.V"               nvals  nrows  ncols  dtype   format\n'
        "ComplementedValueMask\n"
        "of gb.Matrix               3      1      5  INT64  bitmapr\n"
        "----------------------------------------------------------\n"
        "   0  1  2  3  4\n"
        "0  1     0     0"
    )


def test_vector_repr():
    v = gb.Vector.from_coo([1, 3, 4], [1.0, 2.0, 3.0], size=5, name="v")
    # header line byte-identical to reference golden (test_formatting.py:161)
    assert repr(v).startswith(
        '"v"        nvals  size  dtype  format\n'
        "gb.Vector      3     5   FP64  bitmap"
    )
    assert repr(~v.V) == (
        '"~v.V"                 nvals  size  dtype  format\n'
        "ComplementedValueMask\n"
        "of gb.Vector               3     5   FP64  bitmap\n"
        "-------------------------------------------------\n"
        "   0  1  2  3  4\n"
        "0     0     0  0"
    )


def test_scalar_repr():
    s = gb.Scalar.from_value(5, name="s_1")
    assert repr(s) == '"s_1"\nvalue: 5\ndtype: INT64'


def test_expression_repr():
    A = _A()
    e = A.mxm(A.T, gb.semiring.plus_times)
    r = repr(e)
    assert "MatrixExpression" in r and "mxm" in r and "plus_times" in r


def test_unnamed_uses_type_label():
    M = gb.Matrix.from_coo([0], [0], [1], nrows=1, ncols=1)
    assert repr(M).startswith("gb.Matrix")
    v = gb.Vector.from_coo([0], [1], size=1)
    assert repr(v).startswith("gb.Vector")


def test_html_reprs():
    A = _A()
    assert "<" in A._repr_html_()
    v = gb.Vector.from_coo([0], [1.5], size=2, name="v")
    assert "<" in v._repr_html_()
    assert "<pre>" in A.S._repr_html_()
    assert "<pre>" in _B().T._repr_html_()


def test_large_matrix_truncated_repr():
    import numpy as np

    n = 100
    r = np.arange(n)
    M = gb.Matrix.from_coo(r, r, r, nrows=n, ncols=n)
    text = repr(M)
    assert "..." in text
    assert f"{n}" in text.splitlines()[1]
