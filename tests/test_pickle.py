"""Cross-version pickle compatibility against PREGENERATED pickles
(reference tests/test_pickle.py + scripts/create_pickle.py): the committed
tests/data/pickles_v1.pkl was produced by scripts/create_pickle.py and
must keep deserializing in every future version."""

import pathlib
import pickle

import numpy as np
import pytest

import graphblas_tpu as gb

DATA = pathlib.Path(__file__).parent / "data" / "pickles_v1.pkl"


@pytest.fixture(scope="module")
def payload():
    return pickle.loads(DATA.read_bytes())


def test_fixture_exists_and_versioned(payload):
    assert payload["meta"]["format_version"] == 1


def test_matrix_roundtrip(payload):
    A = payload["matrix"]
    assert isinstance(A, gb.Matrix)
    assert A.name == "A_pickled"
    r, c, v = A.to_coo()
    assert r.tolist() == [0, 1, 2]
    assert c.tolist() == [1, 2, 0]
    assert v.tolist() == [1.5, -2.0, 3.25]


def test_sparse_backed_matrix_roundtrip(payload):
    S = payload["sparse_matrix"]
    assert S.nvals == 2
    assert S.to_dicts() == {0: {2: 7}, 2: {1: 9}}


def test_vector_roundtrip(payload):
    v = payload["vector"]
    assert v.size == 5
    assert v.dtype == gb.dtypes.BOOL
    assert v.to_dict() == {0: True, 3: False}


def test_scalar_roundtrip(payload):
    s = payload["scalar"]
    assert s.value == 2**40  # INT64 exactness across the boundary
    assert payload["empty_scalar"].is_empty


def test_udt_vector_roundtrip(payload):
    uv = payload["udt_vector"]
    assert uv.dtype._is_udt
    got = uv.to_coo()[1]
    assert got[0]["x"] == 3.0
    assert got[0]["y"] == 4.5


def test_ops_unpickle_to_singletons(payload):
    ops = payload["ops"]
    assert ops["binary.plus"] is gb.binary.plus
    assert ops["monoid.lor"] is gb.monoid.lor
    assert ops["agg.mean"] is gb.agg.mean
    assert ops["semiring.min_plus"] is gb.semiring.min_plus
    typed = ops["unary.ainv_typed"]
    assert typed.type.name == "INT32"


def test_dtypes_unpickle(payload):
    i64, f32, udt = payload["dtypes"]
    assert i64 is gb.dtypes.INT64
    assert f32 is gb.dtypes.FP32
    assert udt.np_type == np.dtype([("x", np.float64), ("y", np.float64)])


def test_repickle_stability(payload):
    """Objects loaded from the old pickle re-pickle and reload."""
    again = pickle.loads(pickle.dumps(payload))
    assert again["matrix"].isequal(payload["matrix"])
    assert again["ops"]["agg.mean"] is gb.agg.mean


def test_struct_udt_pickles_directly():
    # regression: numpy removed np.lib.format.safe_eval; struct UDT
    # serialization must keep working (core/dtypes.py:_dtype_to_string)
    udt = gb.dtypes.register_anonymous(
        np.dtype([("a", np.float32), ("b", np.float32)]), name="pt2")
    again = pickle.loads(pickle.dumps(udt))
    assert again.np_type == udt.np_type
