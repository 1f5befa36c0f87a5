"""Dtype-coercion tables for builtin operators.

The reference installs "sane coercion" aliases after parsing the C symbols so
idiomatic expressions resolve even when a builtin op lacks a typed kernel for
the operand dtype (reference core/operator/monoid.py:395-431,
binary.py:800-875, semiring.py:391-510).  The alias stores the *target*
dtype's typed op under the *input* dtype key; the engine then casts operand
values to the typed op's declared input types (engine/dense.py apply_binop),
which reproduces the reference's coercion semantics exactly.

Called once from graphblas_tpu/__init__ after the operator namespaces load.
"""

from .. import dtypes as _dt

_NUMERIC10 = None


def _numeric10():
    global _NUMERIC10
    if _NUMERIC10 is None:
        _NUMERIC10 = [
            _dt.FP32, _dt.FP64, _dt.INT8, _dt.INT16, _dt.INT32, _dt.INT64,
            _dt.UINT8, _dt.UINT16, _dt.UINT32, _dt.UINT64,
        ]
    return _NUMERIC10


def _alias(op, input_dtypes, target_dtype):
    typed = op._typed_ops[target_dtype]
    for dt in input_dtypes:
        op._typed_ops.setdefault(dt, typed)


def install():
    """Install reference-compatible dtype coercions on builtin ops."""
    from ... import binary, monoid

    # --- monoids (reference monoid.py:395-431): boolean renaming for
    # max/min/times (plus is deliberately left out of the *namespace*, matching
    # the reference; semirings handle plus-over-BOOL via _BOOL_MONOID_RENAME).
    lor_b = monoid.lor._typed_ops[_dt.BOOL]
    land_b = monoid.land._typed_ops[_dt.BOOL]
    for cur, typed in ((monoid.max, lor_b), (monoid.min, land_b),
                       (monoid.times, land_b)):
        cur._typed_ops.setdefault(_dt.BOOL, typed)
    # logical monoids accept numeric inputs by casting to BOOL
    for cur in (monoid.lor, monoid.land, monoid.lxnor, monoid.lxor):
        _alias(cur, _numeric10(), _dt.BOOL)

    # --- binary ops (reference binary.py:800-875): float-domain ops accept
    # int/bool inputs by promotion to FP32/FP64
    small = [_dt.BOOL, _dt.INT8, _dt.INT16, _dt.UINT8, _dt.UINT16]
    large = [_dt.INT32, _dt.INT64, _dt.UINT32, _dt.UINT64]

    # --- unary float-family ops (reference unary.py:_initialize "sane
    # coercion" list): small ints/bool promote to FP32, large ints to FP64
    from ... import unary

    for name in ("erf", "erfc", "lgamma", "tgamma", "acos", "acosh", "asin",
                 "asinh", "atan", "atanh", "ceil", "cos", "cosh", "exp",
                 "exp2", "expm1", "floor", "log", "log10", "log1p", "log2",
                 "round", "signum", "sin", "sinh", "sqrt", "tan", "tanh",
                 "trunc", "cbrt"):
        op = getattr(unary, name, None)
        if op is None or _dt.FP32 not in op._typed_ops:
            continue
        _alias(op, small, _dt.FP32)
        _alias(op, large, _dt.FP64)
    for name in ("atan2", "copysign", "fmod", "hypot", "remainder"):
        op = getattr(binary, name, None)
        if op is None:
            continue
        _alias(op, small, _dt.FP32)
        _alias(op, large, _dt.FP64)
    lxnor = getattr(binary, "lxnor", None)
    if lxnor is not None and _dt.BOOL in lxnor._typed_ops:
        _alias(lxnor, _numeric10(), _dt.BOOL)
    cmplx = getattr(binary, "cmplx", None)
    if cmplx is not None and _dt.FP32 in cmplx._typed_ops:
        _alias(cmplx, small, _dt.FP32)
        _alias(cmplx, large, _dt.FP64)


# SuiteSparse "boolean renaming": inside a semiring, an arithmetic additive
# monoid over BOOL products means its logical counterpart (SS User Guide;
# this is how GxB resolves e.g. plus_pair on boolean adjacency matrices).
_BOOL_MONOID_RENAME = {
    "plus": "lor",
    "times": "land",
    "min": "land",
    "max": "lor",
}

# Bitwise semirings over signed ints coerce inputs to unsigned
# (reference semiring.py:453-460).
_BITWISE_SIGNED_COERCION = {}


def _bitwise_signed():
    if not _BITWISE_SIGNED_COERCION:
        _BITWISE_SIGNED_COERCION.update({
            _dt.INT8: _dt.UINT16,
            _dt.INT16: _dt.UINT32,
            _dt.INT32: _dt.UINT64,
            _dt.INT64: _dt.UINT64,
        })
    return _BITWISE_SIGNED_COERCION


def bool_monoid_substitute(monoid_op):
    """The logical monoid standing in for an arithmetic monoid over BOOL."""
    from ... import monoid as monoid_ns

    name = _BOOL_MONOID_RENAME.get(monoid_op.name)
    if name is None:
        return None
    return getattr(monoid_ns, name, None)


def bitwise_input_coercion(semiring_op, dtype):
    """Unsigned target dtype for a bitwise semiring over a signed int."""
    _BITW = ("band", "bor", "bxor", "bxnor")
    if semiring_op.monoid is None or semiring_op.binaryop is None:
        return None
    if semiring_op.monoid.name in _BITW and semiring_op.binaryop.name in _BITW:
        return _bitwise_signed().get(dtype)
    return None
