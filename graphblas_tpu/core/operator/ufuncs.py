"""dtype-aware scalar math helpers shared by the builtin operator tables.

GraphBLAS (as implemented by SuiteSparse) pins down edge semantics that differ
from numpy/JAX defaults; to be bit-identical with the reference stack we
implement them explicitly:

- Integer division is C-style *truncated* division, with well-defined
  divide-by-zero results (x/0 -> 0 if x==0, else +/- type extremum).
- BOOL arithmetic: plus=lor, times=land, minus/rminus=lxor, div(x,0)=1,
  minv(x)=1, ainv(x)=x, abs(x)=x, pow(x,y) = x | !y.
- ``minv`` on integers is idiv(1, x).

All helpers take/return jnp arrays of a single already-unified dtype and are
fully traceable (no data-dependent control flow).
"""

import jax.numpy as jnp
import numpy as np


def _intmax(dtype):
    return np.iinfo(dtype).max


def _intmin(dtype):
    return np.iinfo(dtype).min


def is_bool(x):
    return x.dtype == jnp.bool_


def is_int(x):
    return jnp.issubdtype(x.dtype, jnp.integer)


def is_signed(x):
    return jnp.issubdtype(x.dtype, jnp.signedinteger)


def is_float(x):
    return jnp.issubdtype(x.dtype, jnp.floating)


def is_complex(x):
    return jnp.issubdtype(x.dtype, jnp.complexfloating)


def idiv(x, y):
    """C-truncated integer division with SuiteSparse divide-by-zero semantics."""
    dtype = x.dtype
    if is_signed(x):
        zero_res = jnp.where(
            x == 0,
            jnp.array(0, dtype),
            jnp.where(x > 0, jnp.array(_intmax(dtype), dtype), jnp.array(_intmin(dtype), dtype)),
        )
        safe_y = jnp.where(y == 0, jnp.array(1, dtype), y)
        q = x // safe_y
        r = x - q * safe_y
        # floor -> trunc correction: round toward zero when signs differ
        q = jnp.where((r != 0) & ((x < 0) != (safe_y < 0)), q + 1, q)
        return jnp.where(y == 0, zero_res, q)
    # unsigned
    zero_res = jnp.where(x == 0, jnp.array(0, dtype), jnp.array(_intmax(dtype), dtype))
    safe_y = jnp.where(y == 0, jnp.array(1, dtype), y)
    return jnp.where(y == 0, zero_res, x // safe_y)


def gb_div(x, y):
    """GraphBLAS `div` — truncated for ints, bool special-cased, true divide for fp."""
    if is_bool(x):
        return jnp.where(y, x, jnp.ones_like(x))
    if is_int(x):
        return idiv(x, y)
    return x / y


def gb_minv(x):
    if is_bool(x):
        return jnp.ones_like(x)
    if is_int(x):
        return idiv(jnp.ones_like(x), x)
    return 1.0 / x if not is_complex(x) else (1.0 + 0.0j) / x


def gb_plus(x, y):
    if is_bool(x):
        return x | y
    return x + y


def gb_minus(x, y):
    if is_bool(x):
        return x ^ y
    return x - y


def gb_times(x, y):
    if is_bool(x):
        return x & y
    return x * y


def gb_ainv(x):
    if is_bool(x):
        return x
    if jnp.issubdtype(x.dtype, jnp.unsignedinteger):
        # C semantics: two's complement wraparound
        return (jnp.array(0, x.dtype) - x).astype(x.dtype)
    return -x


def gb_abs(x):
    if is_bool(x):
        return x
    return jnp.abs(x)


def gb_pow(x, y):
    if is_bool(x):
        return x | ~y
    if is_int(x):
        # C semantics via float pow, truncated back; SuiteSparse uses powf/pow
        res = jnp.power(x.astype(jnp.float64), y.astype(jnp.float64))
        return _cast_float_to_int(res, x.dtype)
    return jnp.power(x, y)


def _cast_float_to_int(res, dtype):
    """Cast float -> int with C-style saturation-free truncation (matches np cast)."""
    return jnp.trunc(res).astype(dtype)


def gb_min(x, y):
    if is_bool(x):
        return x & y
    if is_float(x):
        # GraphBLAS min is "omin" in SuiteSparse: NaN-aware like fmin
        return jnp.fmin(x, y)
    return jnp.minimum(x, y)


def gb_max(x, y):
    if is_bool(x):
        return x | y
    if is_float(x):
        return jnp.fmax(x, y)
    return jnp.maximum(x, y)


def gb_lnot(x):
    return ~_truthy(x)


def _truthy(x):
    if is_bool(x):
        return x
    return x != 0


def gb_lor(x, y):
    r = _truthy(x) | _truthy(y)
    return r if is_bool(x) else r.astype(x.dtype)


def gb_land(x, y):
    r = _truthy(x) & _truthy(y)
    return r if is_bool(x) else r.astype(x.dtype)


def gb_lxor(x, y):
    r = _truthy(x) ^ _truthy(y)
    return r if is_bool(x) else r.astype(x.dtype)


def gb_lxnor(x, y):
    r = _truthy(x) == _truthy(y)
    return r if is_bool(x) else r.astype(x.dtype)


def gb_signum(x):
    return jnp.sign(x)


def gb_bshift(x, y):
    """Shift x by y bits: left if y>=0, right (arithmetic for signed) if y<0."""
    nbits = x.dtype.itemsize * 8
    yl = y.astype(jnp.int32)
    mag = jnp.abs(yl)
    big = mag >= nbits
    safe = jnp.where(big, 0, mag).astype(x.dtype)
    left = jnp.where(big, jnp.zeros_like(x), x << safe)
    if is_signed(x):
        full = jnp.where(x < 0, jnp.array(-1, x.dtype), jnp.array(0, x.dtype))
        right = jnp.where(big, full, x >> safe)
    else:
        right = jnp.where(big, jnp.zeros_like(x), x >> safe)
    return jnp.where(yl >= 0, left, right)


def gb_bget(x, y):
    pos = y.astype(x.dtype)
    return (x >> pos) & jnp.array(1, x.dtype)


def gb_bset(x, y):
    pos = y.astype(x.dtype)
    return x | (jnp.array(1, x.dtype) << pos)


def gb_bclr(x, y):
    pos = y.astype(x.dtype)
    return x & ~(jnp.array(1, x.dtype) << pos)


def gb_frexpx(x):
    m, _ = jnp.frexp(x)
    return m


def gb_frexpe(x):
    _, e = jnp.frexp(x)
    return e.astype(x.dtype)
