"""Test helpers: fixture graphs + a tiny dense-numpy oracle for GraphBLAS ops."""

import numpy as np

import graphblas_tpu as gb

# The 7-node fixture graph used throughout the reference behavioral tests
# (same data as reference graphblas/tests/test_matrix.py fixtures).
A_ROWS = [3, 0, 3, 5, 6, 0, 6, 1, 6, 2, 4, 1]
A_COLS = [0, 1, 2, 2, 2, 3, 3, 4, 4, 5, 5, 6]
A_VALS = [3, 2, 3, 1, 5, 3, 7, 8, 3, 1, 7, 4]
V_IDX = [1, 3, 4, 6]
V_VALS = [1, 1, 2, 0]


def make_A():
    return gb.Matrix.from_coo(A_ROWS, A_COLS, A_VALS)


def make_v():
    return gb.Vector.from_coo(V_IDX, V_VALS)


def to_dense_pair(x):
    """(values ndarray, present ndarray) from a gb collection."""
    vals, ok = x._host_arrays()
    return np.asarray(vals), np.asarray(ok)


def assert_equal_coo(x, expected_indices, expected_values):
    """Compare a Vector against expected (indices, values)."""
    idx, vals = x.to_coo()
    np.testing.assert_array_equal(idx.astype(np.int64), expected_indices)
    np.testing.assert_array_equal(vals, expected_values)


def assert_matrix_coo(x, rows, cols, vals):
    r, c, v = x.to_coo()
    np.testing.assert_array_equal(r.astype(np.int64), rows)
    np.testing.assert_array_equal(c.astype(np.int64), cols)
    np.testing.assert_array_equal(v, vals)


def random_sparse(rng, shape, density=0.4, dtype=np.float64, low=-5, high=5):
    ok = rng.random(shape) < density
    if np.issubdtype(dtype, np.integer):
        vals = rng.integers(low, high, size=shape).astype(dtype)
    elif dtype == np.bool_:
        vals = rng.random(shape) < 0.5
    else:
        vals = rng.uniform(low, high, size=shape).astype(dtype)
    return vals, ok


def gb_from_pair(vals, ok):
    if vals.ndim == 1:
        idx = np.nonzero(ok)[0]
        return gb.Vector.from_coo(idx, vals[idx], size=vals.shape[0],
                                  dtype=vals.dtype)
    r, c = np.nonzero(ok)
    return gb.Matrix.from_coo(r, c, vals[r, c], nrows=vals.shape[0],
                              ncols=vals.shape[1], dtype=vals.dtype)


# ------------------------------------------------------------------ #
# write-semantics oracle: the full C(mask, accum, replace) << Z rule
# (reference semantics per SURVEY Appendix A: masks filter writes,
# replace clears unwritten, accum merges old/new)
def oracle_mask_array(mask_vals, mask_ok, *, structure, complement):
    m = mask_ok if structure else (mask_ok & (mask_vals != 0))
    return ~m if complement else m


def oracle_update(c_vals, c_ok, z_vals, z_ok, mask=None, *, accum=None,
                  replace=False):
    """Dense-pair oracle for the update rule.

    mask: boolean write-permission array (already structure/value/
    complement resolved) or None.  accum: binary f(old, new) or None.
    Returns (vals, ok) of the updated C.
    """
    c_vals = np.array(c_vals)
    c_ok = np.array(c_ok)
    if mask is None:
        mask = np.ones(c_ok.shape, bool)
    if accum is None:
        new_vals = np.where(z_ok, z_vals, 0)
        new_ok = z_ok.copy()
    else:
        both = c_ok & z_ok
        new_vals = np.where(both, accum(c_vals, z_vals),
                            np.where(z_ok, z_vals, c_vals))
        new_ok = c_ok | z_ok
    out_vals = np.where(mask, new_vals, c_vals)
    out_ok = np.where(mask, new_ok,
                      np.zeros_like(c_ok) if replace else c_ok)
    return np.where(out_ok, out_vals, 0), out_ok


def assert_pair_equal(x, exp_vals, exp_ok, *, isfloat=False):
    vals, ok = to_dense_pair(x)
    np.testing.assert_array_equal(ok, exp_ok)
    vals = np.where(ok, vals, 0)
    exp = np.where(exp_ok, exp_vals, 0)
    if isfloat:
        np.testing.assert_allclose(vals, exp, rtol=1e-6, atol=1e-12)
    else:
        np.testing.assert_array_equal(vals, exp)
