"""COO -> bitmap-store builder shared by Matrix.build / Vector.build.

Sort + dedup run in the native C++ builder when available
(graphblas_tpu/native), then the store is filled by a device scatter — no
O(nrows*ncols) host array is ever materialized.  Duplicate combination uses
vectorized segment reduction for the common dup_ops and a generic grouped
path otherwise (the reference delegates all of this to GrB_Matrix_build in
C; SURVEY §2 row 0).
"""

import numpy as np

from ..exceptions import InvalidValue
from .dtypes import lookup_dtype
from .operator.base import find_opclass
from .operator.utils import get_typed_op


def _combine_dups(sorted_vals, seg_ids, nseg, dup_typed):
    """Reduce duplicate groups with the dup op.  sorted_vals grouped by seg."""
    import jax
    import jax.numpy as jnp

    name = dup_typed.name
    x = jnp.asarray(sorted_vals)
    ids = jnp.asarray(seg_ids)
    if name == "plus":
        return np.asarray(jax.ops.segment_sum(x, ids, num_segments=nseg,
                                              indices_are_sorted=True))
    if name in ("min",):
        return np.asarray(jax.ops.segment_min(x, ids, num_segments=nseg,
                                              indices_are_sorted=True))
    if name in ("max",):
        return np.asarray(jax.ops.segment_max(x, ids, num_segments=nseg,
                                              indices_are_sorted=True))
    if name == "times":
        return np.asarray(jax.ops.segment_prod(x, ids, num_segments=nseg,
                                               indices_are_sorted=True))
    if name in ("first", "any"):
        first_pos = np.concatenate([[0], np.nonzero(np.diff(seg_ids))[0] + 1])
        return sorted_vals[first_pos]
    if name == "second":
        last_pos = np.concatenate([np.nonzero(np.diff(seg_ids))[0],
                                   [len(seg_ids) - 1]])
        return sorted_vals[last_pos]
    # generic: sequential fold within each group (host; groups are rare)
    out = np.empty(nseg, sorted_vals.dtype)
    start = 0
    for s in range(nseg):
        end = start
        while end < len(seg_ids) and seg_ids[end] == s:
            end += 1
        acc = sorted_vals[start]
        for i in range(start + 1, end):
            import jax.numpy as jnp2

            acc = np.asarray(
                dup_typed._jax_func(
                    jnp2.asarray(np.array(acc, dup_typed.type.np_type)),
                    jnp2.asarray(np.array(sorted_vals[i], dup_typed.type2.np_type)),
                )
            )[()]
        out[s] = acc
        start = end
    return out


def sorted_dedup_coo(rows, cols, values, shape, dtype, dup_op):
    """Host-side sort (native C++ radix argsort) + dedup of COO input.

    Returns (r, c, v) sorted lexicographically by (row, col), duplicates
    combined with dup_op.  `cols` may be None for vectors.
    """
    from .. import native

    is_matrix = cols is not None
    nrows = shape[0]
    ncols = shape[1] if is_matrix else 1
    rows = np.ascontiguousarray(rows, np.int64)
    if is_matrix:
        cols = np.ascontiguousarray(cols, np.int64)
    else:
        cols = np.zeros(len(rows), np.int64)
    values = np.asarray(values)

    perm = native.coo_argsort(rows, cols, nrows, ncols)
    r = rows[perm]
    c = cols[perm]
    v = values[perm]
    flags, uniq = native.coo_mark_unique(r, c)
    if uniq != len(r):
        if dup_op is None:
            raise InvalidValue("duplicate indices found; use dup_op to combine")
        dup_typed = get_typed_op(dup_op, dtype, dtype, kind="binary")
        _, oc = find_opclass(dup_typed)
        if oc == "Monoid":
            dup_typed = dup_typed.binaryop
        seg_ids = np.cumsum(flags) - 1
        v = _combine_dups(v.astype(dtype.np_type, copy=False)
                          if not dtype._is_udt else v, seg_ids, uniq, dup_typed)
        keep = flags.astype(bool)
        r = r[keep]
        c = c[keep]
    return r, c, v


def build_sparse_coo_store(rows, cols, values, shape, dtype, dup_op):
    """Matrix COO -> padded-CSR SparseStore (the scale path)."""
    from .engine import sparse as spx

    r, c, v = sorted_dedup_coo(rows, cols, values, shape, dtype, dup_op)
    v_cast = v if dtype._is_udt else np.asarray(v).astype(dtype.np_type,
                                                          copy=False)
    return spx.build_sparse_store(r, c, v_cast, shape[0], shape[1], dtype)


def build_coo_store(rows, cols, values, shape, dtype, dup_op):
    """Return (vals_device, valid_device) for the bitmap store."""
    import jax.numpy as jnp

    from .engine import store as st

    is_matrix = cols is not None
    r, c, v = sorted_dedup_coo(rows, cols, values, shape, dtype, dup_op)

    vals_dev = st.zeros_values(shape, dtype)
    valid_dev = jnp.zeros(shape, bool)
    v_cast = v if dtype._is_udt else np.asarray(v).astype(dtype.np_type, copy=False)
    if is_matrix:
        if dtype.np_type.names:
            for name in dtype.np_type.names:
                vals_dev[name] = vals_dev[name].at[r, c].set(
                    jnp.asarray(np.ascontiguousarray(v_cast[name])))
        else:
            vals_dev = vals_dev.at[jnp.asarray(r), jnp.asarray(c)].set(
                jnp.asarray(v_cast))
        valid_dev = valid_dev.at[jnp.asarray(r), jnp.asarray(c)].set(True)
    else:
        if dtype.np_type.names:
            for name in dtype.np_type.names:
                vals_dev[name] = vals_dev[name].at[r].set(
                    jnp.asarray(np.ascontiguousarray(v_cast[name])))
        else:
            vals_dev = vals_dev.at[jnp.asarray(r)].set(jnp.asarray(v_cast))
        valid_dev = valid_dev.at[jnp.asarray(r)].set(True)
    return vals_dev, valid_dev
