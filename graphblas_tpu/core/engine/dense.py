"""Bitmap-format compute kernels (pure jnp; fused under jit by dispatch.py).

This module implements every GraphBLAS operation over (values, valid) bitmap
stores.  It is the correctness engine and, composed under jit, already fuses
mask+accum+semiring into single XLA computations — the TPU analog of the
reference's single-dispatch choke point (SURVEY §3.2: all knobs meet at
`BaseType._update` -> one C call).  CSR/Pallas specializations for large
sparse operands live in sparse.py and kernels/.

Conventions:
- All functions are pure and traceable; operator objects are static args.
- `vals`/`valid` are jnp arrays (valid is bool of the logical shape; vals may
  be a pytree for UDTs).
- dtype casting follows C-cast semantics (astype; complex->real takes .real).
- Positional ops receive index arrays through the `pos` dict:
  ewise/apply context: keys "i","j"; matmul context: "i","j","k".
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import lookup_dtype
from . import store as st

_INT = jnp.int64


def _iota(shape, dim):
    return jax.lax.broadcasted_iota(_INT, shape, dim)


def truthy(vals, dtype):
    if dtype.is_bool:
        return vals
    if dtype.is_complex:
        return vals != 0
    return vals != 0


def mask_array(m_vals, m_valid, m_dtype, structure, complement):
    if structure:
        arr = m_valid
    else:
        arr = m_valid & truthy(m_vals, m_dtype)
    return ~arr if complement else arr


# --------------------------------------------------------------------- #
# op application helpers
def _positional_value(op, pos, context_map):
    key, off = op._positional
    # binary positional: "ai"/"aj"/"bi"/"bj"; unary positional: "i"/"j"
    idx_key = context_map[key]
    arr = pos[idx_key] + off
    return st.cast_values(arr, lookup_dtype(np.int64), op.return_type)


_EWISE_MAP = {"ai": "i", "aj": "j", "bi": "i", "bj": "j", "i": "i", "j": "j"}
_MATMUL_MAP = {"ai": "i", "aj": "k", "bi": "k", "bj": "j"}


def apply_binop(op, x_vals, x_dt, y_vals, y_dt, pos=None, context_map=_EWISE_MAP):
    """Apply a typed BinaryOp with casting; positional ops use `pos`."""
    if op._positional is not None:
        return _positional_value(op, pos, context_map)
    x = st.cast_values(x_vals, x_dt, op.type)
    y = st.cast_values(y_vals, y_dt, op.type2)
    x, y = jnp.broadcast_arrays(x, y) if not isinstance(x, dict) and not isinstance(y, dict) else (x, y)
    out = op._jax_func(x, y)
    if isinstance(out, dict) or op.return_type._is_udt:
        return out
    return st.cast_values(out, lookup_dtype(out.dtype), op.return_type)


def apply_unop(op, x_vals, x_dt, pos=None):
    if op._positional is not None:
        key, off = op._positional
        arr = pos[key] + off
        return st.cast_values(arr, lookup_dtype(np.int64), op.return_type)
    x = st.cast_values(x_vals, x_dt, op.type)
    out = op._jax_func(x)
    if isinstance(out, dict) or op.return_type._is_udt:
        return out
    return st.cast_values(out, lookup_dtype(out.dtype), op.return_type)


# --------------------------------------------------------------------- #
# element-wise operations
def ewise_mult(a_vals, a_valid, b_vals, b_valid, op, a_dt, b_dt, pos=None):
    valid = a_valid & b_valid
    vals = apply_binop(op, a_vals, a_dt, b_vals, b_dt, pos=pos)
    return vals, valid


def ewise_add(a_vals, a_valid, b_vals, b_valid, op, a_dt, b_dt, out_dt, pos=None):
    both = a_valid & b_valid
    valid = a_valid | b_valid
    combined = apply_binop(op, a_vals, a_dt, b_vals, b_dt, pos=pos)
    a_pass = st.cast_values(a_vals, a_dt, out_dt)
    b_pass = st.cast_values(b_vals, b_dt, out_dt)
    combined = st.cast_values(combined, op.return_type, out_dt)
    vals = st.where_values(both, combined, st.where_values(a_valid, a_pass, b_pass))
    return vals, valid


def ewise_union(a_vals, a_valid, b_vals, b_valid, op, a_dt, b_dt, ldef, rdef, pos=None):
    valid = a_valid | b_valid
    x = st.where_values(a_valid, st.cast_values(a_vals, a_dt, op.type),
                        jnp.broadcast_to(ldef, a_valid.shape).astype(op.type.np_type)
                        if not isinstance(a_vals, dict) else a_vals)
    y = st.where_values(b_valid, st.cast_values(b_vals, b_dt, op.type2),
                        jnp.broadcast_to(rdef, b_valid.shape).astype(op.type2.np_type)
                        if not isinstance(b_vals, dict) else b_vals)
    if op._positional is not None:
        vals = _positional_value(op, pos, _EWISE_MAP)
    else:
        out = op._jax_func(x, y)
        out_dt = lookup_dtype(out.dtype) if not isinstance(out, dict) else op.return_type
        vals = st.cast_values(out, out_dt, op.return_type)
    return vals, valid


def apply_op(a_vals, a_valid, op, a_dt, pos=None):
    return apply_unop(op, a_vals, a_dt, pos=pos), a_valid


def apply_bound(a_vals, a_valid, op, a_dt, scalar_val, scalar_dt, left, pos=None):
    if left:
        shape = a_valid.shape
        s = jnp.broadcast_to(jnp.asarray(scalar_val), shape)
        vals = apply_binop(op, s, scalar_dt, a_vals, a_dt, pos=pos)
    else:
        shape = a_valid.shape
        s = jnp.broadcast_to(jnp.asarray(scalar_val), shape)
        vals = apply_binop(op, a_vals, a_dt, s, scalar_dt, pos=pos)
    return vals, a_valid


def apply_indexunary(a_vals, a_valid, op, a_dt, thunk_val, thunk_dt, is_matrix):
    shape = a_valid.shape
    if is_matrix:
        i = _iota(shape, 0)
        j = _iota(shape, 1)
    else:
        i = _iota(shape, 0)
        j = jnp.zeros(shape, _INT)
    x = st.cast_values(a_vals, a_dt, op.type) if op._positional is None else a_vals
    thunk = jnp.asarray(thunk_val)
    out = op._jax_func(x, i, j, thunk)
    out_dt = lookup_dtype(out.dtype) if not isinstance(out, dict) else op.return_type
    vals = st.cast_values(out, out_dt, op.return_type)
    return vals, a_valid


def select_op(a_vals, a_valid, op, a_dt, thunk_val, thunk_dt, is_matrix, out_dt):
    pred, _ = apply_indexunary(a_vals, a_valid, op, a_dt, thunk_val, thunk_dt, is_matrix)
    valid = a_valid & pred
    return st.cast_values(a_vals, a_dt, out_dt), valid


# --------------------------------------------------------------------- #
# reductions
_FAST_REDUCE = {
    "plus": jnp.sum,
    "times": jnp.prod,
    "min": jnp.min,
    "max": jnp.max,
    "lor": jnp.any,
    "land": jnp.all,
    "bor": jnp.bitwise_or.reduce,
    "band": jnp.bitwise_and.reduce,
    "bxor": jnp.bitwise_xor.reduce,
}


def _reduce_tree(x, valid, combine, axis):
    """Sequential monoid fold for pytree (UDT) values along one axis."""
    if isinstance(axis, tuple):
        x = jax.tree_util.tree_map(
            lambda a: a.reshape((-1,) + a.shape[len(axis):]), x)
        valid = valid.reshape(-1)
        axis = 0
    n = valid.shape[axis]
    first = st.tree_index(x, (slice(None),) * axis + (0,))
    acc0 = (first, valid.take(0, axis=axis))

    def fold(i, acc_pair):
        acc, acc_ok = acc_pair
        xi = jax.tree_util.tree_map(lambda a: a.take(i, axis=axis), x)
        ok_i = valid.take(i, axis=axis)
        both = acc_ok & ok_i
        merged = combine(acc, xi) if combine is not None else acc
        new = st.where_values(both, merged, st.where_values(ok_i, xi, acc))
        return new, acc_ok | ok_i

    acc, ok = jax.lax.fori_loop(1, n, fold, acc0)
    return acc, ok


def reduce_monoid(vals, valid, mono, in_dt, axis):
    """Monoid-reduce along `axis` (int or tuple).  Returns (vals, valid)."""
    name = mono.parent.name
    x = st.cast_values(vals, in_dt, mono.type)
    out_valid = jnp.any(valid, axis=axis)
    if isinstance(x, dict):
        combine = None if name == "any" else mono._jax_func
        red, _ = _reduce_tree(x, valid, combine, axis)
        return red, out_valid
    if name == "any":
        # deterministic: first stored element in row-major order
        if isinstance(axis, tuple):
            flat = x.reshape(-1)
            fvalid = valid.reshape(-1)
            first = jnp.argmax(fvalid)
            return flat[first], out_valid
        first = jnp.argmax(valid, axis=axis)
        picked = jnp.take_along_axis(x, jnp.expand_dims(first, axis), axis=axis)
        return jnp.squeeze(picked, axis=axis), out_valid
    ident = st.identity_value_array(mono, mono.type)
    x = st.where_values(valid, x, jnp.broadcast_to(ident, x.shape))
    fast = _FAST_REDUCE.get(name)
    if fast is not None:
        red = fast(x, axis=axis)
        if red.dtype != mono.type.np_type:
            red = red.astype(mono.type.np_type)
        return red, out_valid
    dims = axis if isinstance(axis, tuple) else (axis,)
    red = jax.lax.reduce(x, ident.astype(x.dtype), lambda a, b: mono._jax_func(a, b), dims)
    return red, out_valid


def reduce_agg(vals, valid, spec, in_dt, ret_dt, axis):
    """Aggregator reduce: map -> combine -> finalize (see operator/agg.py)."""
    import graphblas_tpu.monoid as monoid_ns

    name = spec.monoid_name
    x = vals
    out_valid = jnp.any(valid, axis=axis)
    count = jnp.sum(valid, axis=axis).astype(jnp.float64)
    if spec.custom is not None:
        res = spec.custom(vals, valid, axis)
        return st.cast_values(res, lookup_dtype(res.dtype), ret_dt), out_valid
    if spec.composite is not None:
        # user-defined composite: children evaluate on the same input, then
        # finalize combines the child accumulator arrays (+ count)
        child_accs = []
        for child in spec.composite:
            child_ret = child.ret_rule
            if child_ret is None:
                child_ret = in_dt
            elif callable(child_ret):
                child_ret = child_ret(in_dt)
            acc, _ = reduce_agg(vals, valid, child, in_dt, child_ret, axis)
            child_accs.append(acc)
        res = spec.finalize_fn(*child_accs, count)
        return st.cast_values(res, lookup_dtype(res.dtype), ret_dt), out_valid
    if spec.index_kind is not None:
        return _reduce_agg_index(vals, valid, spec, in_dt, ret_dt, axis), out_valid
    if name == "minmax":  # peak_to_peak
        mx, _ = reduce_monoid(vals, valid, getattr(monoid_ns, "max")[in_dt], in_dt, axis)
        mn, _ = reduce_monoid(vals, valid, getattr(monoid_ns, "min")[in_dt], in_dt, axis)
        return (mx - mn).astype(ret_dt.np_type), out_valid
    if name in ("var_p", "var_s", "std_p", "std_s"):
        xf = st.cast_values(vals, in_dt, lookup_dtype(np.float64))
        xf = jnp.where(valid, xf, 0.0)
        s1 = jnp.sum(xf, axis=axis)
        s2 = jnp.sum(xf * xf, axis=axis)
        n = count
        mean = s1 / n
        var = s2 / n - mean * mean
        if name.endswith("_s"):
            var = var * n / jnp.maximum(n - 1, 1)
        res = jnp.sqrt(var) if name.startswith("std") else var
        return res.astype(ret_dt.np_type), out_valid
    mapped = spec.map_fn(st.cast_values(vals, in_dt, in_dt))
    mdt = lookup_dtype(mapped.dtype)
    mono = (getattr(monoid_ns, name) if isinstance(name, str) else name)[mdt]
    acc, _ = reduce_monoid(mapped, valid, mono, mdt, axis)
    if spec.finalize_fn is not None:
        acc = spec.finalize_fn(acc, count)
    return st.cast_values(acc, lookup_dtype(acc.dtype), ret_dt), out_valid


def _reduce_agg_index(vals, valid, spec, in_dt, ret_dt, axis):
    kind = spec.index_kind
    shape = valid.shape
    if isinstance(axis, tuple):
        # scalar reduce over all dims: flatten
        flat_vals = vals.reshape(-1)
        flat_valid = valid.reshape(-1)
        return _reduce_agg_index(flat_vals, flat_valid, spec, in_dt, ret_dt, 0)
    n = shape[axis]
    idx = _iota(shape, axis)
    if kind in ("first", "first_index"):
        pos = jnp.where(valid, idx, n)
        sel = jnp.min(pos, axis=axis)
        take = jnp.clip(sel, 0, n - 1)
        if kind == "first_index":
            return st.cast_values(sel.astype(jnp.int64), lookup_dtype(np.int64), ret_dt)
        picked = jnp.take_along_axis(vals, jnp.expand_dims(take, axis), axis=axis)
        return st.cast_values(jnp.squeeze(picked, axis=axis), in_dt, ret_dt)
    if kind in ("last", "last_index"):
        pos = jnp.where(valid, idx, -1)
        sel = jnp.max(pos, axis=axis)
        take = jnp.clip(sel, 0, n - 1)
        if kind == "last_index":
            return st.cast_values(sel.astype(jnp.int64), lookup_dtype(np.int64), ret_dt)
        picked = jnp.take_along_axis(vals, jnp.expand_dims(take, axis), axis=axis)
        return st.cast_values(jnp.squeeze(picked, axis=axis), in_dt, ret_dt)
    # argmin / argmax: smallest index achieving the extremum
    big = jnp.array(np.inf if in_dt.is_float else np.iinfo(in_dt.np_type).max, in_dt.np_type)
    small = jnp.array(-np.inf if in_dt.is_float else np.iinfo(in_dt.np_type).min, in_dt.np_type)
    if kind == "argmin":
        masked = jnp.where(valid, vals, big)
        ext = jnp.min(masked, axis=axis, keepdims=True)
        hit = valid & (masked == ext)
    else:
        masked = jnp.where(valid, vals, small)
        ext = jnp.max(masked, axis=axis, keepdims=True)
        hit = valid & (masked == ext)
    pos = jnp.where(hit, idx, n)
    sel = jnp.min(pos, axis=axis)
    return st.cast_values(sel.astype(jnp.int64), lookup_dtype(np.int64), ret_dt)


# --------------------------------------------------------------------- #
# semiring matmul family
def _matmul_block_size(m, k, n):
    budget = 1 << 22  # elements in the (m, kb, n) intermediate
    kb = max(1, min(k, budget // max(1, m * n)))
    return int(kb)


def semiring_matmul(a_vals, a_valid, b_vals, b_valid, ring, a_dt, b_dt):
    """C = A (ring) B over bitmap stores.  A: (m,k), B: (k,n)."""
    mult = ring.binaryop
    mono = ring.monoid
    m, k = a_valid.shape
    n = b_valid.shape[1]
    mono_name = mono.parent.name
    mult_name = mult.parent.name

    # structural output: C[i,j] present iff exists stored k-pair
    counts = jnp.matmul(
        a_valid.astype(jnp.float32), b_valid.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    out_valid = counts > 0.5

    # --- MXU fast paths ---
    if mult_name in ("pair", "oneb"):
        one = jnp.array(1, mono.type.np_type)
        if mono_name in ("any", "lor", "land", "min", "max", "times", "eq",
                         "lxnor", "band", "bor"):
            # all products are 1 -> result is 1 wherever present
            vals = jnp.broadcast_to(one, (m, n)).astype(mono.type.np_type)
            if mono_name == "lxor":
                pass  # handled below
            else:
                return vals, out_valid
        if mono_name == "plus":
            return counts.astype(mono.type.np_type), out_valid
        if mono_name == "lxor":
            par = jnp.mod(counts.astype(jnp.int32), 2).astype(mono.type.np_type)
            return par, out_valid
    if mono_name == "plus" and mult_name == "times" and not a_dt._is_udt:
        acc_t = mono.type.np_type
        av = st.cast_values(a_vals, a_dt, mult.type)
        bv = st.cast_values(b_vals, b_dt, mult.type2)
        if a_dt.is_bool or mult.type.is_bool:
            av = a_valid & truthy(av, mult.type)
            bv = b_valid & truthy(bv, mult.type2)
            cnt = jnp.matmul(av.astype(jnp.float32), bv.astype(jnp.float32),
                             preferred_element_type=jnp.float32)
            return (cnt > 0.5), out_valid
        av = jnp.where(a_valid, av, jnp.array(0, av.dtype))
        bv = jnp.where(b_valid, bv, jnp.array(0, bv.dtype))
        vals = jnp.matmul(av, bv, preferred_element_type=acc_t).astype(acc_t)
        return vals, out_valid
    if mono_name == "lor" and mult_name == "land" and mult.type.is_bool:
        av = a_valid & truthy(st.cast_values(a_vals, a_dt, mult.type), mult.type)
        bv = b_valid & truthy(st.cast_values(b_vals, b_dt, mult.type2), mult.type2)
        cnt = jnp.matmul(av.astype(jnp.float32), bv.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
        return cnt > 0.5, out_valid

    # --- generic blocked path (any semiring, incl. positional) ---
    return _generic_matmul(a_vals, a_valid, b_vals, b_valid, ring, a_dt, b_dt, out_valid)


def _generic_matmul(a_vals, a_valid, b_vals, b_valid, ring, a_dt, b_dt, out_valid):
    mult = ring.binaryop
    mono = ring.monoid
    m, k = a_valid.shape
    n = b_valid.shape[1]
    kb = _matmul_block_size(m, k, n)
    nblocks = -(-k // kb)
    kpad = nblocks * kb

    positional = mult._positional is not None
    if positional:
        av = a_vals
        bv = b_vals
    else:
        av = st.cast_values(a_vals, a_dt, mult.type)
        bv = st.cast_values(b_vals, b_dt, mult.type2)

    def padk(x, axis):
        pad = [(0, 0)] * x.ndim
        pad[axis] = (0, kpad - k)
        return jnp.pad(x, pad)

    av = padk(av, 1)
    bv = padk(bv, 0)
    a_ok = padk(a_valid, 1)
    b_ok = padk(b_valid, 0)

    is_any = mono.parent.name == "any"
    if is_any:
        ident = jnp.zeros((), mono.type.np_type)
    else:
        ident = st.identity_value_array(mono, mono.type)

    mono_f = mono._jax_func
    name = mono.parent.name
    _red = _FAST_REDUCE.get(name)

    def block(carry, idx):
        acc_vals, acc_valid = carry
        a_blk = jax.lax.dynamic_slice_in_dim(av, idx * kb, kb, 1)      # (m,kb)
        b_blk = jax.lax.dynamic_slice_in_dim(bv, idx * kb, kb, 0)      # (kb,n)
        a_vblk = jax.lax.dynamic_slice_in_dim(a_ok, idx * kb, kb, 1)
        b_vblk = jax.lax.dynamic_slice_in_dim(b_ok, idx * kb, kb, 0)
        pvalid = a_vblk[:, :, None] & b_vblk[None, :, :]               # (m,kb,n)
        if positional:
            key, off = mult._positional
            dim = {"ai": 0, "aj": 1, "bi": 1, "bj": 2}[key]
            parr = jax.lax.broadcasted_iota(_INT, (m, kb, n), dim)
            if key in ("aj", "bi"):
                parr = parr + idx * kb
            pv = (parr + off).astype(mult.return_type.np_type)
        else:
            pv = mult._jax_func(
                jnp.broadcast_to(a_blk[:, :, None], (m, kb, n)),
                jnp.broadcast_to(b_blk[None, :, :], (m, kb, n)),
            )
            pv = st.cast_values(pv, lookup_dtype(pv.dtype), mono.type)
        if is_any:
            # first stored product in k order
            first = jnp.argmax(pvalid, axis=1)                          # (m,n)
            picked = jnp.take_along_axis(pv, first[:, None, :], axis=1)[:, 0, :]
            has = jnp.any(pvalid, axis=1)
            new_vals = jnp.where(acc_valid, acc_vals, jnp.where(has, picked, acc_vals))
            new_valid = acc_valid | has
            return (new_vals, new_valid), None
        pv = jnp.where(pvalid, pv, jnp.broadcast_to(ident, pv.shape))
        if _red is not None:
            blk_red = _red(pv, axis=1)
            if blk_red.dtype != mono.type.np_type:
                blk_red = blk_red.astype(mono.type.np_type)
        else:
            blk_red = jax.lax.reduce(pv, ident.astype(pv.dtype),
                                     lambda a, b: mono_f(a, b), (1,))
        has = jnp.any(pvalid, axis=1)
        both = acc_valid & has
        merged = jnp.where(both, mono_f(acc_vals, blk_red),
                           jnp.where(has, blk_red, acc_vals))
        return (merged, acc_valid | has), None

    init_vals = jnp.broadcast_to(ident, (m, n)).astype(mono.type.np_type)
    init_valid = jnp.zeros((m, n), bool)
    (vals, valid), _ = jax.lax.scan(block, (init_vals, init_valid),
                                    jnp.arange(nblocks))
    return vals, out_valid


def kron(a_vals, a_valid, b_vals, b_valid, op, a_dt, b_dt):
    m, n = a_valid.shape
    p, q = b_valid.shape
    x = st.cast_values(a_vals, a_dt, op.type)
    y = st.cast_values(b_vals, b_dt, op.type2)
    out = op._jax_func(
        jnp.broadcast_to(x[:, None, :, None], (m, p, n, q)),
        jnp.broadcast_to(y[None, :, None, :], (m, p, n, q)),
    )
    out = st.cast_values(out, lookup_dtype(out.dtype), op.return_type)
    valid = a_valid[:, None, :, None] & b_valid[None, :, None, :]
    return out.reshape(m * p, n * q), valid.reshape(m * p, n * q)


# --------------------------------------------------------------------- #
# write-back funnel: mask + accum + replace (SURVEY §3.2)
def write_back(c_vals, c_valid, c_dt, z_vals, z_valid, z_dt, mask_arr, accum, replace):
    if accum is not None:
        both = c_valid & z_valid
        cz = st.cast_values(c_vals, c_dt, accum.type)
        zz = st.cast_values(z_vals, z_dt, accum.type2)
        merged = accum._jax_func(cz, zz)
        merged = st.cast_values(merged, lookup_dtype(merged.dtype)
                                if not isinstance(merged, dict) else accum.return_type, c_dt)
        z_cast = st.cast_values(z_vals, z_dt, c_dt)
        new_vals = st.where_values(both, merged, st.where_values(z_valid, z_cast, c_vals))
        new_valid = c_valid | z_valid
    else:
        new_vals = st.where_values(z_valid, st.cast_values(z_vals, z_dt, c_dt), c_vals)
        new_valid = z_valid
    if mask_arr is None:
        return new_vals, new_valid
    if replace:
        out_valid = mask_arr & new_valid
    else:
        out_valid = jnp.where(mask_arr, new_valid, c_valid)
    out_vals = st.where_values(mask_arr & new_valid, new_vals, c_vals)
    return out_vals, out_valid


# --------------------------------------------------------------------- #
# extract / assign / structure ops
def extract_matrix(a_vals, a_valid, rows, cols):
    v = st.tree_take(st.tree_take(a_vals, rows, 0), cols, 1)
    ok = jnp.take(jnp.take(a_valid, rows, axis=0), cols, axis=1)
    return v, ok


def extract_vector(a_vals, a_valid, idx):
    return st.tree_take(a_vals, idx, 0), jnp.take(a_valid, idx, axis=0)


def scatter_matrix(shape, rows, cols, z_vals, z_valid, dtype):
    """Scatter region values into C-space; also return the region mask."""
    out_vals = st.zeros_values(shape, dtype)
    out_valid = jnp.zeros(shape, bool)
    region = jnp.zeros(shape, bool)
    r = rows[:, None]
    c = cols[None, :]
    out_vals = st.tree_set(out_vals, (r, c), z_vals)
    out_valid = out_valid.at[r, c].set(z_valid)
    region = region.at[r, c].set(True)
    return out_vals, out_valid, region


def scatter_vector(size, idx, z_vals, z_valid, dtype):
    out_vals = st.zeros_values((size,), dtype)
    out_valid = jnp.zeros((size,), bool)
    region = jnp.zeros((size,), bool)
    out_vals = st.tree_set(out_vals, idx, z_vals)
    out_valid = out_valid.at[idx].set(z_valid)
    region = region.at[idx].set(True)
    return out_vals, out_valid, region


def subassign(c_vals, c_valid, c_dt, z_vals, z_valid, z_dt, region, submask_arr,
              accum, replace):
    """GxB_subassign semantics: mask & replace scoped to the region."""
    z_cast = st.cast_values(z_vals, z_dt, c_dt)
    if accum is not None:
        both = c_valid & z_valid
        cz = st.cast_values(c_vals, c_dt, accum.type)
        zz = st.cast_values(z_vals, z_dt, accum.type2)
        merged = accum._jax_func(cz, zz)
        merged = st.cast_values(merged, lookup_dtype(merged.dtype)
                                if not isinstance(merged, dict) else accum.return_type, c_dt)
        new_vals = st.where_values(both, merged, st.where_values(z_valid, z_cast, c_vals))
        new_valid = jnp.where(region, c_valid | z_valid, c_valid)
    else:
        new_vals = st.where_values(z_valid, z_cast, c_vals)
        new_valid = jnp.where(region, z_valid, c_valid)
    if submask_arr is None:
        write = region
        out_vals = st.where_values(write, new_vals, c_vals)
        out_valid = jnp.where(write, new_valid, c_valid)
        return out_vals, out_valid
    write = region & submask_arr
    out_vals = st.where_values(write, new_vals, c_vals)
    out_valid = jnp.where(write, new_valid, c_valid)
    if replace:
        out_valid = jnp.where(region & ~submask_arr, False, out_valid)
    return out_vals, out_valid


def transpose(vals, valid):
    if isinstance(vals, dict):
        return {k: jnp.swapaxes(v, 0, 1) for k, v in vals.items()}, valid.T
    perm = (1, 0) + tuple(range(2, vals.ndim))
    return jnp.transpose(vals, perm), valid.T


def diag_extract(a_vals, a_valid, k):
    v = jnp.diagonal(a_vals, offset=k, axis1=0, axis2=1)
    ok = jnp.diagonal(a_valid, offset=k, axis1=0, axis2=1)
    return v, ok


def diag_build(v_vals, v_valid, k, n):
    """Build (n,n) matrix with v on diagonal k."""
    size = v_valid.shape[0]
    vals = st.zeros_values((n, n), lookup_dtype(v_vals.dtype))
    valid = jnp.zeros((n, n), bool)
    idx = jnp.arange(size)
    if k >= 0:
        r, c = idx, idx + k
    else:
        r, c = idx - k, idx
    vals = vals.at[r, c].set(v_vals)
    valid = valid.at[r, c].set(v_valid)
    return vals, valid


def reposition(vals, valid, offsets, out_shape):
    """Shift all indices by offsets (cropping); reference matrix.py:2679."""
    pads = []
    slices = []
    for off, dim_out, dim_in in zip(offsets, out_shape, valid.shape):
        if off >= 0:
            pads.append((off, max(0, dim_out - dim_in - off)))
            slices.append(slice(0, dim_out))
        else:
            pads.append((0, max(0, dim_out - dim_in - off)))
            slices.append(slice(-off, -off + dim_out))
    svals = st.tree_index(st.tree_pad(vals, pads), tuple(slices))
    svalid = jnp.pad(valid, pads)[tuple(slices)]
    return svals, svalid


# --------------------------------------------------------------------- #
# rowwise order kernels: sort / compactify / selectk
# (reference core/ss/matrix.py:3815-4050 implements these with numba host
# loops; here they are vectorized jnp argsort/take_along_axis on the bitmap
# store, so they run on-device)

def _row_order(vals, valid, how, rng_keys=None):
    """Permutation ordering stored elements per row by `how`; missing
    elements always order last.  Exact for all dtypes: a composite-key
    lax.sort on (missing_flag, value_key) — no float-cast of int keys, no
    sentinel collisions; the descending int transform ~v is overflow-free."""
    colid = jax.lax.broadcasted_iota(jnp.int32, valid.shape, valid.ndim - 1)
    missing = (~valid).astype(jnp.int8)
    if how == "first":
        key2 = colid
    elif how == "last":
        key2 = -colid
    elif how == "random":
        key2 = rng_keys
    elif how in ("smallest", "asc", "largest", "desc"):
        v = vals
        if v.dtype == jnp.bool_:
            v = v.astype(jnp.int8)
        if how in ("largest", "desc"):
            v = ~v if jnp.issubdtype(v.dtype, jnp.integer) else -v
        key2 = v
    else:
        raise ValueError(f"Invalid how: {how}")
    _, _, order = jax.lax.sort(
        (missing, key2, colid), dimension=valid.ndim - 1, num_keys=2,
        is_stable=True)
    return order


def rowwise_compactify(vals, valid, how, width, rng_keys=None):
    """Pack stored values left per row in the given order; output is
    (nrows, width) with the first count[i] slots valid."""
    order = _row_order(vals, valid, how, rng_keys)
    packed = jnp.take_along_axis(vals, order, axis=-1)
    counts = valid.sum(axis=-1, keepdims=valid.ndim > 1)
    colid = jax.lax.broadcasted_iota(jnp.int32, valid.shape, valid.ndim - 1)
    out_ok = colid < counts
    ncols = valid.shape[-1]
    if width < ncols:
        packed = packed[..., :width]
        out_ok = out_ok[..., :width]
    return packed, out_ok


def rowwise_sort(vals, valid, descending=False):
    """Sort stored values within each row; returns (sorted values packed
    left, permutation of original column indices, validity)."""
    order = _row_order(vals, valid, "desc" if descending else "asc")
    packed = jnp.take_along_axis(vals, order, axis=-1)
    counts = valid.sum(axis=-1, keepdims=valid.ndim > 1)
    colid = jax.lax.broadcasted_iota(jnp.int32, valid.shape, valid.ndim - 1)
    out_ok = colid < counts
    return packed, order.astype(jnp.int64), out_ok


def rowwise_selectk(vals, valid, how, k, rng_keys=None):
    """Keep at most k stored elements per row (at their original
    positions), chosen by `how`."""
    order = _row_order(vals, valid, how, rng_keys)
    # rank = inverse permutation of order: rank[i, order[i, r]] = r
    rank = jnp.argsort(order, axis=-1)
    return vals, valid & (rank < k)
