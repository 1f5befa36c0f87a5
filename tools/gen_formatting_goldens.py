"""Regenerate tests/test_formatting_goldens.py from the live renderer.

Run after intentional formatting changes; eyeball the diff before
committing (goldens are a contract, not a snapshot).  The case list below
is the contract surface: the reference fixture set (reference
graphblas/tests/test_formatting.py:64-135) plus dtype variants (BOOL,
INT8, FP32, FC64, struct UDT), truncation geometries, masks, transposed
views, expression reprs and HTML.

Usage: python tools/gen_formatting_goldens.py [--check]
  --check: regenerate to a temp string and diff against the committed
  file (CI drift check; exit 1 on mismatch).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                os.pardir))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")

import graphblas_tpu as gb  # noqa: E402
from graphblas_tpu import Matrix, Scalar, Vector  # noqa: E402

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, os.pardir, "tests", "test_formatting_goldens.py")

FIXTURE_SRC = '''
def _fixtures():
    rng = np.random.default_rng(7)
    with gb.config.set(auto_sparse_limit=1 << 62):
        A = Matrix.from_coo([0, 0, 0], [0, 2, 4], [0, 1, 2], nrows=1, ncols=5,
                            name="A_1")
        B = Matrix.from_coo([0, 2, 4], [0, 0, 0], [10, 20, 30], nrows=5,
                            ncols=1, name="B_1")
        C = Matrix.from_coo([0, 9, 60, 69, 0, 9, 60, 69],
                            [4, 4, 4, 4, 72, 72, 72, 72],
                            [0, 2, 3, 4, 5, 6, 7, 8],
                            nrows=70, ncols=77, name="C")
        D = Matrix.from_coo([0, 9, 60, 69], [4, 4, 4, 4],
                            [True, False, True, False], nrows=70,
                            name="D_skinny_in_one_dim")
        v = Vector.from_coo([0, 2, 4], [0.0, 1.1, 2.2], name="v")
        w = Vector.from_coo([0, 5, 64, 69], [1, 2, 3, 4], size=77, name="w")
        s = Scalar.from_value(42, name="s_1")
        t = Scalar(int, name="t")
        F = Matrix.from_coo([0, 1, 2], [0, 1, 2], [1.25, -2.5, 3.75],
                            nrows=3, ncols=3, dtype="FP32", name="F")
        G = Matrix.from_coo([0, 1], [1, 0], [1 + 2j, 3 - 4j], nrows=2,
                            ncols=2, dtype="FC64", name="G")
        H = Matrix.from_coo([0, 1, 5], [1, 3, 5], [True, False, True],
                            nrows=6, ncols=6, dtype="BOOL", name="H")
        K = Matrix.from_coo([0, 3], [0, 3], [-128, 127], nrows=4, ncols=4,
                            dtype="INT8", name="K")
        big = Matrix.from_coo(rng.integers(0, 100, 60),
                              rng.integers(0, 100, 60),
                              np.arange(60), nrows=100, ncols=100,
                              dup_op=gb.binary.first, name="big")
        wide = Matrix.from_coo([0, 2, 5], [0, 100, 199], [1, 2, 3],
                               nrows=6, ncols=200, name="wide")
        tall = Matrix.from_coo([0, 100, 199], [0, 2, 5], [1, 2, 3],
                               nrows=200, ncols=6, name="tall")
        u200 = Vector.from_coo([0, 50, 150, 199], [9, 8, 7, 6], size=200,
                               name="u200")
        bvec = Vector.from_coo([0, 2], [True, False], size=5, dtype="BOOL",
                               name="bvec")
        fvec = Vector.from_coo([1, 3], [0.5, -1.5], size=4, dtype="FP32",
                               name="fvec")
        cvec = Vector.from_coo([0], [2 + 3j], size=3, dtype="FC64",
                               name="cvec")
        udt = gb.dtypes.register_anonymous(
            np.dtype([("x", np.float64), ("y", np.int64)]), "GoldPointT")
        pv = Vector(udt, 3, name="pv")
        pv[0] = (1.5, 2)
        sF = Scalar.from_value(2.5, dtype="FP32", name="sF")
        sB = Scalar.from_value(False, name="sB")
        sC = Scalar.from_value(1 - 1j, dtype="FC64", name="sC")
    return dict(A=A, B=B, C=C, D=D, v=v, w=w, s=s, t=t, F=F, G=G, H=H, K=K,
                big=big, wide=wide, tall=tall, u200=u200, bvec=bvec,
                fvec=fvec, cvec=cvec, pv=pv, sF=sF, sB=sB, sC=sC)
'''

# (test-name, expression) pairs; the expression is evaluated with the
# fixture dict in scope and must produce a deterministic string
CASES = [
    # base fixture reprs (the round-4 set)
    ("matrix_A", "repr(f['A'])"),
    ("matrix_B", "repr(f['B'])"),
    ("matrix_C_truncated", "repr(f['C'])"),
    ("matrix_D_skinny", "repr(f['D'])"),
    ("vector_v", "repr(f['v'])"),
    ("vector_w_truncated", "repr(f['w'])"),
    ("scalar_s", "repr(f['s'])"),
    ("scalar_t_empty", "repr(f['t'])"),
    # dtype variants
    ("matrix_F_fp32", "repr(f['F'])"),
    ("matrix_G_fc64", "repr(f['G'])"),
    ("matrix_H_bool", "repr(f['H'])"),
    ("matrix_K_int8", "repr(f['K'])"),
    ("vector_bvec_bool", "repr(f['bvec'])"),
    ("vector_fvec_fp32", "repr(f['fvec'])"),
    ("vector_cvec_fc64", "repr(f['cvec'])"),
    ("vector_pv_udt", "repr(f['pv'])"),
    ("scalar_sF_fp32", "repr(f['sF'])"),
    ("scalar_sB_bool", "repr(f['sB'])"),
    ("scalar_sC_fc64", "repr(f['sC'])"),
    # truncation geometries
    ("matrix_big_100x100", "repr(f['big'])"),
    ("matrix_wide_6x200", "repr(f['wide'])"),
    ("matrix_tall_200x6", "repr(f['tall'])"),
    ("vector_u200_truncated", "repr(f['u200'])"),
    # transposed views
    ("transposed_A", "repr(f['A'].T)"),
    ("transposed_C_truncated", "repr(f['C'].T)"),
    ("transposed_wide", "repr(f['wide'].T)"),
    # masks: all four kinds on matrix and vector
    ("mask_C_S", "repr(f['C'].S)"),
    ("mask_C_V", "repr(f['C'].V)"),
    ("mask_C_S_complement", "repr(~f['C'].S)"),
    ("mask_C_V_complement", "repr(~f['C'].V)"),
    ("mask_D_S", "repr(f['D'].S)"),
    ("mask_D_V", "repr(f['D'].V)"),
    ("mask_w_S", "repr(f['w'].S)"),
    ("mask_w_V", "repr(f['w'].V)"),
    ("mask_w_S_complement", "repr(~f['w'].S)"),
    ("mask_w_V_complement", "repr(~f['w'].V)"),
    ("mask_v_V", "repr(f['v'].V)"),
    ("mask_H_V_bool", "repr(f['H'].V)"),
    # expression reprs
    ("expr_mxm", "repr(f['A'].mxm(f['B'], gb.semiring.plus_times))"),
    ("expr_mxm_T", "repr(f['C'].mxm(f['C'].T, gb.semiring.plus_times))"),
    ("expr_mxv", "repr(f['C'].mxv(f['w'], gb.semiring.min_plus))"),
    ("expr_vxm", "repr(f['w'].vxm(f['C'].T, gb.semiring.plus_times))"),
    ("expr_ewise_add", "repr(f['v'].ewise_add(f['v'], gb.binary.plus))"),
    ("expr_ewise_mult", "repr(f['C'].ewise_mult(f['C'], gb.binary.times))"),
    ("expr_ewise_union",
     "repr(f['v'].ewise_union(f['v'], gb.binary.plus, 0, 0))"),
    ("expr_apply_unary", "repr(f['v'].apply(gb.unary.ainv))"),
    ("expr_apply_bound", "repr(f['w'].apply(gb.binary.plus, right=1))"),
    ("expr_select", "repr(f['C'].select(gb.select.valuegt, 3))"),
    ("expr_reduce_rowwise", "repr(f['C'].reduce_rowwise(gb.monoid.plus))"),
    ("expr_reduce_scalar", "repr(f['C'].reduce_scalar(gb.monoid.plus))"),
    ("expr_reduce_vector", "repr(f['w'].reduce(gb.monoid.plus))"),
    ("expr_kronecker", "repr(f['A'].kronecker(f['A'], gb.binary.times))"),
    ("expr_extract_matrix", "repr(f['C'][0:10, 0:10])"),
    ("expr_extract_vector", "repr(f['w'][0:5])"),
    ("expr_extract_row", "repr(f['C'][0, :])"),
    ("expr_extract_col", "repr(f['C'][:, 4])"),
    ("expr_extract_element", "repr(f['C'][0, 4])"),
    ("expr_infix_matmul", "repr(f['A'] @ f['B'])"),
    ("expr_infix_and", "repr(f['v'] & f['v'])"),
    ("expr_infix_or", "repr(f['v'] | f['v'])"),
    ("expr_infix_plus", "repr(f['v'] + 1)"),
    ("expr_transposed_infix", "repr(f['B'].T @ f['B'])"),
    # iso-ish / from_scalar and diag
    ("matrix_iso", "repr(Matrix.from_scalar(7, 2, 3, name='iso7'))"),
    ("vector_diag_expr", "repr(f['v'].diag())"),
    # html (structure-bearing sample of each shape class)
    ("html_matrix_A", "f['A']._repr_html_()"),
    ("html_matrix_C", "f['C']._repr_html_()"),
    ("html_vector_w", "f['w']._repr_html_()"),
    ("html_scalar_s", "f['s']._repr_html_()"),
    ("html_mask_C_S", "f['C'].S._repr_html_()"),
    ("html_transposed_A", "f['A'].T._repr_html_()"),
    # name handling / unnamed objects
    ("matrix_unnamed", "repr(Matrix.from_coo([0], [0], [5], nrows=1, ncols=1))"),
    ("vector_unnamed", "repr(Vector.from_coo([0], [5]))"),
    ("scalar_unnamed", "repr(Scalar.from_value(5))"),
    ("matrix_empty", "repr(Matrix(gb.dtypes.FP64, 3, 4, name='E'))"),
    ("vector_empty", "repr(Vector(gb.dtypes.INT32, 6, name='e'))"),
]

# dtype-variant sweeps: masks and expressions over each non-default dtype
for _nm in ("F", "G", "H", "K"):
    CASES += [
        (f"mask_{_nm}_S", f"repr(f['{_nm}'].S)"),
        (f"mask_{_nm}_V_complement", f"repr(~f['{_nm}'].V)"),
        (f"expr_{_nm}_ewise_mult",
         f"repr(f['{_nm}'].ewise_mult(f['{_nm}'], gb.binary.times))"),
        (f"expr_{_nm}_apply", f"repr(f['{_nm}'].apply(gb.unary.identity))"),
        (f"transposed_{_nm}", f"repr(f['{_nm}'].T)"),
    ]

CASES += [
    # boundary truncation geometries
    ("matrix_1x1", "repr(Matrix.from_coo([0], [0], [3.5], name='one'))"),
    ("matrix_2x199",
     "repr(Matrix.from_coo([0, 1], [0, 198], [1, 2], nrows=2, ncols=199,"
     " name='m2x199'))"),
    ("matrix_199x2",
     "repr(Matrix.from_coo([0, 198], [0, 1], [1, 2], nrows=199, ncols=2,"
     " name='m199x2'))"),
    ("matrix_64x64",
     "repr(Matrix.from_coo([0, 63], [0, 63], [1, 2], nrows=64, ncols=64,"
     " name='m64'))"),
    ("matrix_65x65",
     "repr(Matrix.from_coo([0, 64], [0, 64], [1, 2], nrows=65, ncols=65,"
     " name='m65'))"),
    ("vector_size1", "repr(Vector.from_coo([0], [1], name='v1'))"),
    ("vector_size64",
     "repr(Vector.from_coo([0, 63], [1, 2], size=64, name='v64'))"),
    ("vector_size65",
     "repr(Vector.from_coo([0, 64], [1, 2], size=65, name='v65'))"),
    ("vector_size128",
     "repr(Vector.from_coo([0, 127], [1, 2], size=128, name='v128'))"),
    # updater reprs
    ("updater_matrix_masked", "repr(f['C'](f['C'].S))"),
    ("updater_matrix_accum", "repr(f['C'](accum=gb.binary.plus))"),
    ("updater_vector_replace", "repr(f['w'](f['w'].V, replace=True))"),
    # select / indexunary sweeps
    ("expr_select_tril", "repr(f['C'].select(gb.select.tril))"),
    ("expr_select_triu", "repr(f['C'].select(gb.select.triu, 1))"),
    ("expr_select_rowle", "repr(f['C'].select(gb.select.rowle, 9))"),
    ("expr_apply_indexunary",
     "repr(f['C'].apply(gb.indexunary.rowindex))"),
    # vector-vector products
    ("expr_inner", "repr(f['w'].inner(f['w'], gb.semiring.plus_times))"),
    ("expr_outer", "repr(f['v'].outer(f['v'], gb.binary.times))"),
    # unofficial methods
    ("expr_reposition", "repr(f['C'].reposition(1, 1))"),
    ("expr_power", "repr(f['F'].power(2, gb.semiring.plus_times))"),
    # reductions over other dtypes
    ("expr_reduce_H_lor", "repr(f['H'].reduce_scalar(gb.monoid.lor))"),
    ("expr_reduce_K_max", "repr(f['K'].reduce_rowwise(gb.monoid.max))"),
    # more HTML coverage
    ("html_matrix_D", "f['D']._repr_html_()"),
    ("html_matrix_G_fc64", "f['G']._repr_html_()"),
    ("html_vector_v", "f['v']._repr_html_()"),
    ("html_vector_pv_udt", "f['pv']._repr_html_()"),
    ("html_mask_w_V_complement", "(~f['w'].V)._repr_html_()"),
    ("html_scalar_t_empty", "f['t']._repr_html_()"),
    ("html_expr_mxm",
     "f['A'].mxm(f['B'], gb.semiring.plus_times)._repr_html_()"),
    # scalar variants
    ("scalar_cscalar", "repr(Scalar.from_value(3, is_cscalar=True,"
     " name='cs'))"),
    ("scalar_fp_precision", "repr(Scalar.from_value(1/3, name='third'))"),
    # dup preserves repr shape with new name
    ("matrix_dup", "repr(f['A'].dup(name='A_dup'))"),
    ("vector_dup_dtype", "repr(f['v'].dup(dtype='FP32', name='v32'))"),
]


def build():
    ns = {"gb": gb, "Matrix": Matrix, "Vector": Vector, "Scalar": Scalar,
          "np": np}
    exec(FIXTURE_SRC, ns)
    f = ns["_fixtures"]()
    lines = [
        '"""Golden-output repr tests (reference graphblas/tests/'
        'test_formatting.py).',
        "",
        "GENERATED by tools/gen_formatting_goldens.py -- do not edit by",
        "hand; re-run the generator after intentional renderer changes and",
        "eyeball the diff (goldens are a contract, not a snapshot).  The",
        "fixture set extends the reference suite's (test_formatting.py:",
        "64-135) with dtype variants, truncation geometries, masks,",
        "transposed views, expression reprs and HTML.",
        '"""',
        "",
        "import numpy as np",
        "",
        "import graphblas_tpu as gb",
        "from graphblas_tpu import Matrix, Scalar, Vector",
        "",
        "",
    ]
    lines.append(FIXTURE_SRC.strip())
    lines.append("")
    for name, expr in CASES:
        # inline constructions must stay bitmap-backed regardless of the
        # suite's --force-sparse axis: the format column is part of the
        # pinned repr
        with gb.config.set(auto_sparse_limit=1 << 62):
            got = eval(expr, ns, {"f": f})
        if not isinstance(got, str) or not got:
            raise AssertionError(f"case {name}: non-string or empty repr")
        lines.append("")
        lines.append(f"def test_{name}():")
        lines.append("    f = _fixtures()")
        lines.append("    with gb.config.set(auto_sparse_limit=1 << 62):")
        lines.append(f"        got = {expr}")
        lines.append(f"    assert got == {got!r}")
        lines.append("")
    return "\n".join(lines) + "\n"


def main():
    text = build()
    if "--check" in sys.argv:
        with open(OUT) as fh:
            committed = fh.read()
        if committed != text:
            print("formatting goldens are stale: re-run "
                  "tools/gen_formatting_goldens.py", file=sys.stderr)
            sys.exit(1)
        print("goldens up to date")
        return
    with open(OUT, "w") as fh:
        fh.write(text)
    print(f"wrote {OUT} with {len(CASES)} cases")


if __name__ == "__main__":
    main()
