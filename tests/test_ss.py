import numpy as np
import pytest

import graphblas_tpu as gb
from graphblas_tpu import binary, dtypes, monoid

from .helpers import make_A, make_v


@pytest.fixture
def A():
    return make_A()


@pytest.fixture
def v():
    return make_v()


def test_matrix_export_import_roundtrip(A):
    for fmt in ["csr", "csc", "hypercsr", "hypercsc", "bitmapr", "bitmapc",
                "coor"]:
        d = A.ss.export(fmt)
        assert d["format"] == fmt
        B = gb.Matrix.ss.import_any(**d)
        assert B.isequal(A), fmt


def test_matrix_export_full():
    M = gb.Matrix.from_scalar(2, 3, 4)
    d = M.ss.export("fullr")
    assert d["values"].shape == (3, 4)
    B = gb.Matrix.ss.import_any(**d)
    assert B.isequal(M)
    A = make_A()
    with pytest.raises(Exception):
        A.ss.export("fullr")


def test_vector_export_import(v):
    for fmt in ["sparse", "bitmap"]:
        d = v.ss.export(fmt)
        w = gb.Vector.ss.import_any(**d)
        assert w.isequal(v), fmt
    full = gb.Vector.from_scalar(1, 4)
    d = full.ss.export("full")
    w = gb.Vector.ss.import_any(**d)
    assert w.isequal(full)


def test_split_concat(A):
    tiles = A.ss.split([4, None])
    assert len(tiles) == 2 and len(tiles[0]) == 1
    assert tiles[0][0].shape == (4, 7)
    assert tiles[1][0].shape == (3, 7)
    B = gb.ss.concat(tiles)
    assert B.isequal(A)
    tiles2 = A.ss.split([[3, 4], [2, 5]])
    assert tiles2[0][1].shape == (3, 5)
    B2 = gb.ss.concat(tiles2)
    assert B2.isequal(A)


def test_vector_split_concat(v):
    parts = v.ss.split(3)
    assert [p.size for p in parts] == [3, 3, 1]
    w = gb.ss.concat(parts)
    assert w.isequal(v)


def test_flatten_reshape(A):
    f = A.ss.flatten()
    assert f.size == 49
    assert f[0 * 7 + 1].new().value == 2
    M = A.ss.reshape(49, 1)
    assert M.shape == (49, 1)
    back = M.ss.reshape(7, 7)
    assert back.isequal(A)
    fc = A.ss.flatten(order="columnwise")
    assert fc[0 * 7 + 3].new().value == 3  # A[3,0] in col order


def test_selectk_compactify(A):
    first2 = A.ss.selectk("first", 2)
    counts = first2.reduce_rowwise(gb.agg.count).new().to_dict()
    assert all(c <= 2 for c in counts.values())
    largest1 = A.ss.selectk("largest", 1)
    assert largest1[1, 4].new().value == 8
    comp = A.ss.compactify("first")
    assert comp.nvals == A.nvals
    assert comp.ncols == 3  # max row degree


def test_sort(A):
    C, P = A.ss.sort("<")
    # row 6 values 5,7,3 -> sorted 3,5,7 with permutation cols 4,2,3
    assert C[6, 0].new().value == 3
    assert C[6, 1].new().value == 5
    assert C[6, 2].new().value == 7
    assert P[6, 0].new().value == 4
    Cd = A.ss.sort(">", permutation=False)
    assert Cd[6, 0].new().value == 7


def test_serialize_roundtrip(A, v):
    blob = A.ss.serialize()
    B = gb.Matrix.ss.deserialize(blob)
    assert B.isequal(A)
    blob2 = v.ss.serialize(compression=None)
    w = gb.Vector.ss.deserialize(blob2)
    assert w.isequal(v)


def test_scan(v):
    s = v.ss.scan()
    # v = {1:1, 3:1, 4:2, 6:0}; prefix sums over stored: 1, 2, 4, 4
    assert s.to_dict() == {1: 1, 3: 2, 4: 4, 6: 4}
    A = make_A()
    S = A.ss.scan()
    assert S[6, 2].new().value == 5
    assert S[6, 3].new().value == 12
    assert S[6, 4].new().value == 15


def test_scan_matches_cumsum(rng):
    vals = rng.integers(1, 5, size=20)
    v = gb.Vector.from_dense(vals)
    s = v.ss.scan()
    np.testing.assert_array_equal(s.to_dense(), np.cumsum(vals))


def test_iterators(A, v):
    keys = list(A.ss.iterkeys())
    assert keys[0] == (0, 1)
    assert len(keys) == 12
    items = list(v.ss.iteritems())
    assert items == [(1, 1), (3, 1), (4, 2), (6, 0)]


def test_is_iso(A):
    assert not A.ss.is_iso
    M = gb.Matrix.from_scalar(5, 2, 2)
    assert M.ss.is_iso
    assert M.ss.iso_value.value == 5


def test_head(v):
    idx, vals = v.ss.head(2)
    assert idx.tolist() == [1, 3]
    assert vals.tolist() == [1, 1]


def test_global_config_about():
    assert "format" in gb.ss.config
    assert gb.ss.config["burble"] is False
    with pytest.raises(KeyError):
        gb.ss.config["bogus"] = 1
    about = gb.ss.about
    assert about["library_name"] == "graphblas_tpu"
    assert "jax_version" in about


def test_global_diag(v):
    M = gb.ss.diag(v)
    assert M.shape == (7, 7)
    d = gb.ss.diag(M)
    assert d.isequal(v.dup(mask=v.S))


def test_context():
    from graphblas_tpu.ss import Context

    with Context(nthreads=4) as ctx:
        assert ctx.nthreads == 4
        v = make_v()
        assert v.reduce(monoid.plus).new().value == 4
    ctx2 = Context(engage=False)
    assert not ctx2._engaged


# --------------------------------------------------------------------- #
# expanded format surface: named importers, pack/unpack, iso blobs, concat
# (reference core/ss/matrix.py:1165-3220, 363)

def test_named_importers_matrix(A):
    for fmt in ["csr", "csc", "hypercsr", "hypercsc", "bitmapr", "bitmapc",
                "coor", "cooc", "coo"]:
        d = A.ss.export(fmt)
        d.pop("format")
        B = getattr(gb.Matrix.ss, f"import_{fmt}")(**d)
        assert B.isequal(A), fmt


def test_named_importers_vector(v):
    for fmt in ["sparse", "bitmap"]:
        d = v.ss.export(fmt)
        d.pop("format")
        w = getattr(gb.Vector.ss, f"import_{fmt}")(**d)
        assert w.isequal(v), fmt


def test_unpack_pack_roundtrip(A):
    B = A.dup()
    d = B.ss.unpack("csr")
    assert B.nvals == 0  # shell left valid-but-empty
    B.ss.pack_csr(**{k: v for k, v in d.items() if k != "format"})
    assert B.isequal(A)
    # pack_any with format in dict
    C = A.dup()
    d2 = C.ss.unpack("hypercsr")
    C.ss.pack_any(**d2)
    assert C.isequal(A)


def test_vector_unpack_pack(v):
    w = v.dup()
    d = w.ss.unpack("sparse")
    assert w.nvals == 0
    w.ss.pack_sparse(**{k: x for k, x in d.items() if k != "format"})
    assert w.isequal(v)


def test_import_iso_blob():
    # reference-style iso blob: single stored value broadcast over structure
    B = gb.Matrix.ss.import_csr(
        indptr=np.array([0, 2, 3]), col_indices=np.array([0, 1, 1]),
        values=np.array([7]), is_iso=True, nrows=2, ncols=2, dtype="INT64")
    expected = gb.Matrix.from_coo([0, 0, 1], [0, 1, 1], [7, 7, 7],
                                  nrows=2, ncols=2)
    assert B.isequal(expected)
    w = gb.Vector.ss.import_sparse(
        indices=np.array([1, 3]), values=np.array([2.5]), is_iso=True, size=5)
    assert w.isequal(gb.Vector.from_coo([1, 3], [2.5, 2.5], size=5))


def test_export_reports_is_iso():
    M = gb.Matrix.from_scalar(2, 3, 4)
    assert M.ss.export("csr")["is_iso"]
    A = make_A()
    assert not A.ss.export("csr")["is_iso"]


def test_cooc_export_sorted_by_cols(A):
    d = A.ss.export("cooc")
    assert d["sorted_cols"] and not d["sorted_rows"]
    assert (np.diff(d["cols"]) >= 0).all()
    B = gb.Matrix.ss.import_cooc(**{k: v for k, v in d.items() if k != "format"})
    assert B.isequal(A)


def test_matrix_ss_concat_method(A):
    tiles = A.ss.split([4, None])
    B = gb.Matrix(A.dtype, *A.shape)
    B.ss.concat(tiles)
    assert B.isequal(A)


def test_vector_ss_concat_method(v):
    tiles = v.ss.split(3)
    w = gb.Vector(v.dtype, v.size)
    w.ss.concat(tiles)
    assert w.isequal(v)


def test_unpack_hyperhash_none(A):
    assert A.ss.unpack_hyperhash() is None


# --------------------------------------------------------------------- #
# vectorized on-device selectk/compactify/sort (engine/dense.py kernels)

def test_selectk_matrix_all_hows():
    A = gb.Matrix.from_coo([0, 0, 0, 1, 1], [1, 3, 4, 0, 2],
                           [5, 1, 3, 2, 2], nrows=3, ncols=5)
    first2 = A.ss.selectk("first", 2)
    assert first2.to_dicts() == {0: {1: 5, 3: 1}, 1: {0: 2, 2: 2}}
    last1 = A.ss.selectk("last", 1)
    assert last1.to_dicts() == {0: {4: 3}, 1: {2: 2}}
    small1 = A.ss.selectk("smallest", 1)
    assert small1.to_dicts() == {0: {3: 1}, 1: {0: 2}}
    large1 = A.ss.selectk("largest", 1)
    assert large1.to_dicts() == {0: {1: 5}, 1: {0: 2}}
    rnd = A.ss.selectk("random", 2)
    assert rnd.nvals == 4  # 2 from row 0 (3 stored), 2 from row 1 (2 stored)
    with pytest.raises(ValueError):
        A.ss.selectk("bogus", 1)


def test_selectk_int64_extremes():
    # exact int ordering: the composite-key sort must not round int64 keys
    big = 2**62 + 1
    v = gb.Vector.from_coo([0, 1, 2], [big, big - 1, -big], size=4,
                           dtype="INT64")
    assert v.ss.selectk("largest", 1).to_dict() == {0: big}
    assert v.ss.selectk("smallest", 1).to_dict() == {2: -big}


def test_compactify_matrix():
    A = gb.Matrix.from_coo([0, 0, 0, 2], [1, 3, 4, 2], [5, 1, 3, 7],
                           nrows=3, ncols=5)
    c = A.ss.compactify("first")
    assert c.shape == (3, 3)
    assert c.to_dicts() == {0: {0: 5, 1: 1, 2: 3}, 2: {0: 7}}
    c2 = A.ss.compactify("largest", 2)
    assert c2.to_dicts() == {0: {0: 5, 1: 3}, 2: {0: 7}}
    c3 = A.ss.compactify("last", 1)
    assert c3.to_dicts() == {0: {0: 3}, 2: {0: 7}}


def test_sort_matrix_rowwise_and_columnwise():
    A = gb.Matrix.from_coo([0, 0, 0, 1], [0, 2, 4, 1], [3, 1, 2, 9],
                           nrows=2, ncols=5)
    C, P = A.ss.sort()
    assert C.to_dicts() == {0: {0: 1, 1: 2, 2: 3}, 1: {0: 9}}
    assert P.to_dicts() == {0: {0: 2, 1: 4, 2: 0}, 1: {0: 1}}
    Cd = A.ss.sort(">", permutation=False)
    assert Cd.to_dicts() == {0: {0: 3, 1: 2, 2: 1}, 1: {0: 9}}
    # columnwise sort of the 5x2 transpose-equivalent
    B = gb.Matrix.from_coo([0, 2, 4, 1], [0, 0, 0, 1], [3, 1, 2, 9],
                           nrows=5, ncols=2)
    Cc, Pc = B.ss.sort(rowwise=False)
    assert Cc.to_dicts() == {0: {0: 1, 1: 9}, 1: {0: 2}, 2: {0: 3}}
    assert Pc.to_dicts() == {0: {0: 2, 1: 1}, 1: {0: 4}, 2: {0: 0}}


def test_sort_vector():
    v = gb.Vector.from_coo([0, 2, 5], [3.0, 1.0, 2.0], size=6)
    w, p = v.ss.sort()
    assert w.to_dict() == {0: 1.0, 1: 2.0, 2: 3.0}
    assert p.to_dict() == {0: 2, 1: 5, 2: 0}


def test_random_choice_helper():
    from graphblas_tpu.core.ss.vector import random_choice

    ch = random_choice(10, 4)
    assert len(ch) == 4 and len(set(ch.tolist())) == 4
    assert ch.dtype == np.uint64
    assert (random_choice(3, 5) == np.arange(3)).all()


def test_sparsity_control_live():
    """Per-object config tier is live (SURVEY §5; reference
    core/ss/matrix.py:124-180 sparsity_control)."""
    A = gb.Matrix.from_coo([0, 1], [1, 0], [1.0, 2.0], nrows=3, ncols=3)
    # initial backing follows auto_sparse_limit (the --force-sparse axis
    # makes every matrix sparse-backed from birth)
    auto = A._sparse is None
    assert A.ss.config["sparsity_status"] == ("bitmap" if auto else "sparse")
    A.ss.config["sparsity_control"] = "sparse"
    assert A._sparse is not None
    assert A.ss.config["sparsity_status"] == "sparse"
    assert A.ss.config["format"] == "csr"
    assert A[0, 1].new().value == 1.0
    A.ss.config["sparsity_control"] = "bitmap"
    assert A._sparse is None
    assert A.ss.config["sparsity_status"] == "bitmap"
    assert A[1, 0].new().value == 2.0
    from graphblas_tpu.exceptions import InvalidValue

    with pytest.raises(InvalidValue):
        A.ss.config["sparsity_control"] = "bogus"
    with pytest.raises(InvalidValue):
        A.ss.config["sparsity_status"] = "sparse"


def test_context_mapping_interface():
    """Context is a config mapping like the reference's BaseConfig
    MutableMapping (reference core/ss/context.py:19; r4 VERDICT weak #10)."""
    c = gb.ss.Context(engage=False, nthreads=3, chunk=512)
    assert c["nthreads"] == 3
    assert c["chunk"] == 512
    c["nthreads"] = 5
    assert c.nthreads == 5
    assert "nthreads" in c
    assert sorted(c) == sorted(c.keys())
    assert len(c) == len(c.keys())
    assert dict(c.items())["chunk"] == 512
    assert c.get("bogus", "dflt") == "dflt"
    with pytest.raises(KeyError):
        c["bogus"]
    with pytest.raises(KeyError):
        c["bogus"] = 1


def test_unpack_hyperhash_compute():
    """compute=True builds the open-addressing acceleration structure for
    a hypersparse matrix (reference GxB_unpack_HyperHash, core/ss/
    matrix.py:3664); every hyperlist row must be findable by probing."""
    n = 10000
    rows = np.array([3, 777, 4096, 9999])
    A = gb.Matrix.from_coo(np.repeat(rows, 2),
                           np.tile(np.array([1, 5]), len(rows)),
                           np.arange(8), nrows=n, ncols=n)
    exp = A.ss.export("rowwise")
    if exp.get("format") != "hypercsr":
        pytest.skip("matrix did not export hypersparse")
    Y = A.ss.unpack_hyperhash(compute=True)
    assert Y is not None
    assert Y.dtype.name == "INT64"
    size = Y.nrows
    assert size & (size - 1) == 0 and size >= 2 * len(rows)
    r_, c_, v_ = Y.to_coo()
    table = {}
    for rr, cc, vv in zip(r_.astype(int), c_.astype(int), v_.astype(int)):
        table.setdefault(rr, {})[cc] = vv
    hyper_rows = np.asarray(exp["rows"], np.int64)
    mask = size - 1
    for k, row in enumerate(hyper_rows):
        h = (int(row) * 0x9E3779B1) & mask
        while table[h][0] != row:
            h = (h + 1) & mask
        assert table[h][1] == k
    # non-hypersparse and compute=False stay None
    D = gb.Matrix.from_coo([0, 1], [0, 1], [1, 2], nrows=2, ncols=2)
    assert D.ss.unpack_hyperhash(compute=True) is None
    assert A.ss.unpack_hyperhash() is None
