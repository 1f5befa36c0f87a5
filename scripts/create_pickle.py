"""Generate the cross-version pickle-compat fixture (reference
scripts/create_pickle.py).  Run from the repo root:

    python scripts/create_pickle.py

writes tests/data/pickles_v1.pkl, which tests/test_pickle.py loads to
verify that objects pickled by an EARLIER library version still
deserialize — the reference pins this with pregenerated pickles."""

import pickle
import pathlib

import numpy as np


def build():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import graphblas_tpu as gb

    A = gb.Matrix.from_coo([0, 1, 2], [1, 2, 0], [1.5, -2.0, 3.25],
                           nrows=3, ncols=3, name="A_pickled")
    with gb.config.set(auto_sparse_limit=0):
        S = gb.Matrix.from_coo([0, 2], [2, 1], [7, 9], nrows=3, ncols=3,
                               name="S_sparse")
    v = gb.Vector.from_coo([0, 3], [True, False], size=5, name="v_pickled")
    s = gb.Scalar.from_value(2**40, name="s_pickled")
    empty = gb.Scalar(gb.dtypes.FP32, name="empty_pickled")
    udt = gb.dtypes.register_anonymous(
        np.dtype([("x", np.float64), ("y", np.float64)]), name="PicklePoint")
    uv = gb.Vector.from_coo([0], np.array([(3.0, 4.5)], udt.np_type),
                            size=2, dtype=udt, name="udt_vec")
    payload = {
        "matrix": A,
        "sparse_matrix": S,
        "vector": v,
        "scalar": s,
        "empty_scalar": empty,
        "udt_vector": uv,
        "ops": {
            "binary.plus": gb.binary.plus,
            "semiring.min_plus": gb.semiring.min_plus,
            "monoid.lor": gb.monoid.lor,
            "agg.mean": gb.agg.mean,
            "unary.ainv_typed": gb.unary.ainv["INT32"],
        },
        "dtypes": [gb.dtypes.INT64, gb.dtypes.FP32, udt],
        "meta": {"format_version": 1},
    }
    out = pathlib.Path(__file__).parent.parent / "tests" / "data" / \
        "pickles_v1.pkl"
    out.write_bytes(pickle.dumps(payload, protocol=4))
    print(f"wrote {out} ({out.stat().st_size} bytes)")


if __name__ == "__main__":
    build()
