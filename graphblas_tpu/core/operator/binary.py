"""BinaryOp: builtin table + user registration + commutation tables.

Parity target: reference graphblas/core/operator/binary.py:312 (builtin
grammar at :332-369, commutation tables :370-419, register_new:668) and the
extra Python-side UDF binaries of binary/__init__.py:14-22.
"""

import jax.numpy as jnp
import numpy as np

from .. import dtypes as _dt
from . import ufuncs as uf
from .base import OpBase, ParameterizedUdf, TypedOpBase, _normalize_sig

__all__ = ["BinaryOp", "TypedBuiltinBinaryOp", "TypedUserBinaryOp"]

_ALL13 = [
    _dt.BOOL,
    _dt.INT8,
    _dt.INT16,
    _dt.INT32,
    _dt.INT64,
    _dt.UINT8,
    _dt.UINT16,
    _dt.UINT32,
    _dt.UINT64,
    _dt.FP32,
    _dt.FP64,
    _dt.FC32,
    _dt.FC64,
]
_D11 = _ALL13[:11]
_INT8T = _D11[1:9]
_FP = [_dt.FP32, _dt.FP64]
_FC = [_dt.FC32, _dt.FC64]
_FPFC = _FP + _FC
_POS = [_dt.INT32, _dt.INT64]


class TypedBuiltinBinaryOp(TypedOpBase):
    __slots__ = ()
    opclass = "BinaryOp"

    def __call__(self, left, right=None, *, left_default=None, right_default=None):
        from .utils import _call_op

        return _call_op(
            self, left, right, left_default=left_default, right_default=right_default
        )

    @property
    def monoid(self):
        mono = self.parent.monoid
        if mono is not None and self.type in mono._typed_ops:
            return mono._typed_ops[self.type]
        return None

    @property
    def commutes_to(self):
        c = self.parent.commutes_to
        if c is not None and self.type in c._typed_ops:
            return c._typed_ops[self.type]
        return None


class TypedUserBinaryOp(TypedBuiltinBinaryOp):
    __slots__ = ()


def _c_fmod(x, y):
    if uf.is_int(x):
        safe = jnp.where(y == 0, jnp.array(1, y.dtype), y)
        r = x - uf.idiv(x, y) * safe
        return jnp.where(y == 0, x, r)
    return jnp.fmod(x, y)


def _c_remainder(x, y):
    # IEEE remainder: x - round_to_even(x/y)*y
    return x - jnp.round(x / y) * y


def _ldexp(x, y):
    return jnp.ldexp(x, jnp.trunc(y).astype(jnp.int32))


def _cmplx(x, y):
    ct = jnp.complex64 if x.dtype == jnp.float32 else jnp.complex128
    return x.astype(ct) + 1j * y.astype(ct)


def _truediv_ret(dt):
    if dt.is_float or dt.is_complex:
        return dt
    return _dt.FP64


def _truediv(x, y):
    if uf.is_float(x) or uf.is_complex(x):
        return x / y
    return x.astype(jnp.float64) / y.astype(jnp.float64)


def _is_wrap(boolfn):
    def fn(x, y):
        r = boolfn(x, y)
        return r if uf.is_bool(x) else r.astype(x.dtype)

    return fn


# name -> (domains, func, return_rule)
_BOOL = _dt.BOOL
_CMPLX_RET = {_dt.FP32: _dt.FC32, _dt.FP64: _dt.FC64}

_BUILTIN = {
    "first": (_ALL13, lambda x, y: x, None),
    "second": (_ALL13, lambda x, y: y, None),
    "pair": (_ALL13, lambda x, y: jnp.ones_like(x), None),  # alias: oneb
    "any": (_ALL13, lambda x, y: x, None),  # engine may pick either; we pick first
    "plus": (_ALL13, uf.gb_plus, None),
    "minus": (_ALL13, uf.gb_minus, None),
    "rminus": (_ALL13, lambda x, y: uf.gb_minus(y, x), None),
    "times": (_ALL13, uf.gb_times, None),
    # GraphBLAS `div` is exposed as `cdiv` (truncated C division), with
    # `truediv` always returning floating point (reference binary.py:754-789)
    "cdiv": (_ALL13, uf.gb_div, None),
    "rdiv": (_ALL13, lambda x, y: uf.gb_div(y, x), None),
    "truediv": (_ALL13, lambda x, y: _truediv(x, y), _truediv_ret),
    "rtruediv": (_ALL13, lambda x, y: _truediv(y, x), _truediv_ret),
    "min": (_D11, uf.gb_min, None),
    "max": (_D11, uf.gb_max, None),
    "pow": (_ALL13, uf.gb_pow, None),
    # "is" comparisons: return same dtype
    "iseq": (_ALL13, _is_wrap(lambda x, y: x == y), None),
    "isne": (_ALL13, _is_wrap(lambda x, y: x != y), None),
    "isgt": (_D11, _is_wrap(lambda x, y: x > y), None),
    "islt": (_D11, _is_wrap(lambda x, y: x < y), None),
    "isge": (_D11, _is_wrap(lambda x, y: x >= y), None),
    "isle": (_D11, _is_wrap(lambda x, y: x <= y), None),
    # logical (same-dtype returning over D11)
    "lor": (_D11, uf.gb_lor, None),
    "land": (_D11, uf.gb_land, None),
    "lxor": (_D11, uf.gb_lxor, None),
    "lxnor": (_D11, uf.gb_lxnor, None),
    # bitwise
    "bor": (_INT8T, lambda x, y: x | y, None),
    "band": (_INT8T, lambda x, y: x & y, None),
    "bxor": (_INT8T, lambda x, y: x ^ y, None),
    "bxnor": (_INT8T, lambda x, y: ~(x ^ y), None),
    "bget": (_INT8T, uf.gb_bget, None),
    "bset": (_INT8T, uf.gb_bset, None),
    "bclr": (_INT8T, uf.gb_bclr, None),
    "bshift": (_INT8T, uf.gb_bshift, None),
    # float-only
    "atan2": (_FP, jnp.arctan2, None),
    "hypot": (_FP, jnp.hypot, None),
    "fmod": (_FP, _c_fmod, None),
    "remainder": (_FP, _c_remainder, None),
    "ldexp": (_FP, _ldexp, None),
    "copysign": (_FP, jnp.copysign, None),
    # bool-returning comparisons
    "eq": (_ALL13, lambda x, y: x == y, _BOOL),
    "ne": (_ALL13, lambda x, y: x != y, _BOOL),
    "gt": (_D11, lambda x, y: x > y, _BOOL),
    "lt": (_D11, lambda x, y: x < y, _BOOL),
    "ge": (_D11, lambda x, y: x >= y, _BOOL),
    "le": (_D11, lambda x, y: x <= y, _BOOL),
    # complex constructor
    "cmplx": (_FP, _cmplx, lambda dt: _CMPLX_RET[dt]),
}

# positional binaries (``.ss`` namespace in the reference;
# core/operator/base.py:21-85 relocates them)
_POSITIONAL = {
    "firsti": ("ai", 0),
    "firsti1": ("ai", 1),
    "firstj": ("aj", 0),
    "firstj1": ("aj", 1),
    "secondi": ("bi", 0),
    "secondi1": ("bi", 1),
    "secondj": ("bj", 0),
    "secondj1": ("bj", 1),
}

# reference binary.py:370-419
_COMMUTES = {
    "plus": "plus",
    "times": "times",
    "min": "min",
    "max": "max",
    "lor": "lor",
    "land": "land",
    "lxor": "lxor",
    "lxnor": "lxnor",
    "eq": "eq",
    "ne": "ne",
    "iseq": "iseq",
    "isne": "isne",
    "pair": "pair",
    "any": "any",
    "hypot": "hypot",
    "bor": "bor",
    "band": "band",
    "bxor": "bxor",
    "bxnor": "bxnor",
    "first": "second",
    "second": "first",
    "gt": "lt",
    "lt": "gt",
    "ge": "le",
    "le": "ge",
    "isgt": "islt",
    "islt": "isgt",
    "isge": "isle",
    "isle": "isge",
    "minus": "rminus",
    "rminus": "minus",
    "cdiv": "rdiv",
    "rdiv": "cdiv",
    "truediv": "rtruediv",
    "rtruediv": "truediv",
    "firsti": "secondi",
    "firsti1": "secondi1",
    "firstj": "secondj",
    "firstj1": "secondj1",
    "secondi": "firsti",
    "secondi1": "firsti1",
    "secondj": "firstj",
    "secondj1": "firstj1",
    "absfirst": "abssecond",
    "abssecond": "absfirst",
    "floordiv": "rfloordiv",
    "rfloordiv": "floordiv",
    "pow": "rpow",
    "rpow": "pow",
    "isclose": "isclose",
}

# names whose builtin is associated with a monoid of the same name
_HAS_MONOID = frozenset(
    ["plus", "times", "min", "max", "lor", "land", "lxor", "lxnor", "eq", "any",
     "bor", "band", "bxor", "bxnor"]
)


class BinaryOp(OpBase):
    """A function that maps two values to one value (reference binary.py:312)."""

    __slots__ = ("_monoid",)
    _modname = "binary"
    _typed_class = TypedBuiltinBinaryOp

    def __init__(self, name, *, anonymous=False):
        super().__init__(name, anonymous=anonymous)
        self._monoid = None

    @property
    def monoid(self):
        if self._monoid is None and not self._anonymous and self.name in _HAS_MONOID:
            from ... import monoid as monoid_ns

            self._monoid = getattr(monoid_ns, self.name, None)
        return self._monoid

    @property
    def commutes_to(self):
        cname = _COMMUTES.get(self.name)
        if cname is None:
            return None
        from ... import binary as binary_ns

        try:
            return getattr(binary_ns, cname)
        except AttributeError:
            return None

    def __call__(self, left, right=None, *, left_default=None, right_default=None):
        from .utils import _call_op

        return _call_op(
            self, left, right, left_default=left_default, right_default=right_default
        )

    @classmethod
    def _build_builtin(cls, name, domains, func, ret_rule, positional=None):
        op = cls(name)
        op._positional = positional
        if name in ("first", "second", "pair", "any"):
            op._udt_func = func
        for dt in domains:
            rt = _ret(ret_rule, dt)
            op._add(TypedBuiltinBinaryOp(op, name, dt, rt, func))
        return op

    def _build_udt_typed(self, dtype, dtype2):
        func = self._udt_func
        if dtype._is_udt or dtype2._is_udt:
            if self.name == "first":
                rt = dtype
            elif self.name == "second":
                rt = dtype2
            elif self.name in ("pair", "any"):
                rt = dtype
            else:
                rt = dtype
            return TypedUserBinaryOp(self, self.name, dtype, rt, func, type2=dtype2)
        rt = type(self)._infer_return_dtype(func, dtype, dtype2)
        cls = TypedUserBinaryOp if self._anonymous or not self._typed_ops else TypedBuiltinBinaryOp
        return cls(self, self.name, dtype, rt, func, type2=dtype2)

    @classmethod
    def register_anonymous(cls, func, name=None, *, parameterized=False, is_udt=False):
        if parameterized:
            return ParameterizedBinaryOp(name, func, anonymous=True, is_udt=is_udt)
        _normalize_sig(func, 2, "BinaryOp")
        op = cls(name if name is not None else getattr(func, "__name__", "binary_op"), anonymous=True)
        op._udt_func = _wrap_user_binary(func)
        if not is_udt:
            for dt in _ALL13:
                try:
                    op._typed_ops[dt] = op._build_udt_typed(dt, dt)
                except Exception:  # noqa: BLE001
                    continue
        return op

    @classmethod
    def register_new(cls, name, func, *, parameterized=False, is_udt=False, lazy=False):
        from .utils import _register_into_namespace

        op = cls.register_anonymous(func, name, parameterized=parameterized, is_udt=is_udt)
        op._anonymous = False
        _register_into_namespace("binary", name, op)
        return op


class ParameterizedBinaryOp(ParameterizedUdf):
    __slots__ = "func", "_is_udt_flag", "_monoid"

    def __init__(self, name, func, *, anonymous=False, is_udt=False):
        super().__init__(name if name is not None else getattr(func, "__name__", "binary_op"), anonymous)
        self.func = func
        self._is_udt_flag = is_udt
        self._monoid = None

    @property
    def monoid(self):
        return self._monoid

    def __call__(self, *args, **kwargs):
        inner = self.func(*args, **kwargs)
        return BinaryOp.register_anonymous(inner, self.name, is_udt=self._is_udt_flag)


def _wrap_user_binary(func):
    def wrapper(x, y):
        out = func(x, y)
        if isinstance(out, dict):  # UDT (struct) result
            return out
        return jnp.asarray(out)

    return wrapper


def _ret(rule, dt):
    if rule is None:
        return dt
    if callable(rule):
        return rule(dt)
    return rule


# ---------------------------------------------------------------------- #
# Python-side UDF binaries of the reference (binary/__init__.py:14-22)
def _absfirst(x, y):
    return jnp.abs(x)


def _abssecond(x, y):
    return jnp.abs(y)


def _binom(x, y):
    from jax.scipy.special import gammaln

    xf = x.astype(jnp.float64)
    yf = y.astype(jnp.float64)
    res = jnp.exp(gammaln(xf + 1) - gammaln(yf + 1) - gammaln(xf - yf + 1))
    res = jnp.round(res)
    if uf.is_int(x) or uf.is_bool(x):
        return res.astype(jnp.int64 if uf.is_bool(x) else x.dtype)
    return res.astype(x.dtype)


def _floordiv(x, y):
    if uf.is_bool(x):
        return uf.gb_div(x, y)
    if uf.is_int(x):
        safe = jnp.where(y == 0, jnp.array(1, y.dtype), y)
        return jnp.where(y == 0, uf.idiv(x, y), x // safe)
    return jnp.floor_divide(x, y)


def _rfloordiv(x, y):
    return _floordiv(y, x)


def _rpow(x, y):
    return uf.gb_pow(y, x)


def _isclose_factory(rel_tol=1e-7, abs_tol=0.0):
    def inner(x, y):
        return jnp.abs(x - y) <= (abs_tol + rel_tol * jnp.abs(y))

    return inner


_EXTRA_UDFS = {
    "absfirst": _absfirst,
    "abssecond": _abssecond,
    "binom": _binom,
    "floordiv": _floordiv,
    "rfloordiv": _rfloordiv,
    "rpow": _rpow,
}


def _initialize_builtins(namespace):
    ops = {}
    for name, (domains, func, ret_rule) in _BUILTIN.items():
        ops[name] = BinaryOp._build_builtin(name, domains, func, ret_rule)
    ops["oneb"] = ops["pair"]
    for name, pos in _POSITIONAL.items():
        op = BinaryOp(name)
        op._positional = pos
        for dt in _POS:
            op._add(TypedBuiltinBinaryOp(op, name, dt, dt, None))
        ops[name] = op
    for name, func in _EXTRA_UDFS.items():
        op = BinaryOp.register_anonymous(func, name)
        op._anonymous = False
        ops[name] = op
    ops["isclose"] = ParameterizedBinaryOp("isclose", _isclose_factory)
    namespace.update(ops)
    return ops
