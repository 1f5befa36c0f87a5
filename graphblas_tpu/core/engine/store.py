"""Device storage: bitmap/dense stores as JAX pytrees.

The universal on-device format in the dense engine is the *bitmap* format of
the reference's `.ss` layer (SURVEY Appendix C: `bitmap` = bool presence
array + same-shape values array): it has static shapes (XLA-friendly), maps
masks/structure to plain boolean algebra, and lets every op fuse.  CSR (for
big sparse graphs + Pallas kernels) lives in sparse.py.

UDT values are pytrees: numpy subarray dtypes become trailing array
dimensions, struct dtypes become dicts of field arrays.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import lookup_dtype


def _leaf_np_dtypes(dtype):
    """Yield (path, np_dtype, subshape) leaves for a DataType (UDT-aware)."""
    nt = dtype.np_type
    if nt.names:
        for name in nt.names:
            ft = nt.fields[name][0]
            if ft.subdtype is not None:
                yield name, ft.subdtype[0], ft.subdtype[1]
            else:
                yield name, ft, ()
    elif nt.subdtype is not None:
        yield None, nt.subdtype[0], nt.subdtype[1]
    else:
        yield None, nt, ()


def zeros_values(shape, dtype):
    """Allocate zero-filled values pytree for the given logical shape."""
    leaves = list(_leaf_np_dtypes(dtype))
    with jax.enable_x64(True):
        if len(leaves) == 1 and leaves[0][0] is None:
            _, nt, sub = leaves[0]
            return jnp.zeros(tuple(shape) + tuple(sub), nt)
        return {
            name: jnp.zeros(tuple(shape) + tuple(sub), nt)
            for name, nt, sub in leaves
        }


def full_values(shape, dtype, fill):
    leaves = list(_leaf_np_dtypes(dtype))
    with jax.enable_x64(True):
        if len(leaves) == 1 and leaves[0][0] is None:
            _, nt, sub = leaves[0]
            return jnp.full(tuple(shape) + tuple(sub), fill, nt)
        if isinstance(fill, dict):
            return {
                name: jnp.full(tuple(shape) + tuple(sub), fill[name], nt)
                for name, nt, sub in leaves
            }
        return {
            name: jnp.full(tuple(shape) + tuple(sub), fill, nt)
            for name, nt, sub in leaves
        }


def np_values_to_device(array, dtype):
    """Convert a host numpy array (possibly structured) to the device pytree."""
    nt = dtype.np_type
    with jax.enable_x64(True):
        if nt.names:
            # np.ascontiguousarray promotes 0-d to 1-d; use copy() instead
            return {name: jnp.asarray(array[name].copy()) for name in nt.names}
        return jnp.asarray(array)


def device_values_to_np(values, dtype, shape):
    """Convert device values pytree back to a host numpy array of np_type."""
    nt = dtype.np_type
    if nt.names:
        out = np.empty(shape, nt)
        for name in nt.names:
            out[name] = np.asarray(values[name])
        return out
    arr = np.asarray(values)
    if nt.subdtype is not None:
        return arr
    return arr.astype(nt, copy=False)


def where_values(mask, a, b):
    """tree-aware jnp.where with mask broadcast over trailing UDT dims."""

    def _w(x, y):
        m = mask
        extra = x.ndim - mask.ndim
        if extra:
            m = mask.reshape(mask.shape + (1,) * extra)
        return jnp.where(m, x, y)

    return jax.tree_util.tree_map(_w, a, b)


def cast_values(values, from_dtype, to_dtype):
    """GraphBLAS-typecast a values pytree (astype semantics == C casts)."""
    if from_dtype == to_dtype:
        return values
    if from_dtype._is_udt or to_dtype._is_udt:
        if from_dtype.np_type == to_dtype.np_type:
            return values
        raise TypeError(f"Cannot cast UDT {from_dtype} to {to_dtype}")
    target = to_dtype.np_type
    if from_dtype.is_complex and not to_dtype.is_complex:
        return values.real.astype(target)
    return values.astype(target)


def tree_index(vals, idx):
    """Index a values pytree with a (possibly traced) index tuple."""
    return jax.tree_util.tree_map(lambda a: a[idx], vals)


def tree_take(vals, idx, axis):
    return jax.tree_util.tree_map(lambda a: jnp.take(a, idx, axis=axis), vals)


def tree_set(vals, idx, update):
    """`.at[idx].set(update)` over a values pytree."""
    if isinstance(vals, dict):
        return {k: vals[k].at[idx].set(update[k]) for k in vals}
    return vals.at[idx].set(update)


def tree_pad(vals, pads):
    return jax.tree_util.tree_map(
        lambda a: jnp.pad(a, list(pads) + [(0, 0)] * (a.ndim - len(pads))), vals
    )


def identity_value_array(mono, dtype):
    """Monoid identity as a () jnp array of the given DataType (None for
    any-monoid).

    Never called on the dispatch hot path outside a trace (the eligibility
    gates use the host-side ``mono.identity is None`` check instead): an
    uncached host->device scalar transfer between kernels stalls the
    tunneled-TPU device stream by ~33 ms.  Do NOT memoize the result —
    inside a trace this returns a trace-scoped value, and caching it leaks
    tracers across jits."""
    ident = mono.identity
    if ident is None:
        return None
    with jax.enable_x64(True):
        return jnp.asarray(np.array(ident, dtype.np_type))
