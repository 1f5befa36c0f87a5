"""UnaryOp: builtin table + user registration.

Parity target: reference graphblas/core/operator/unary.py:130 and the builtin
inventory in SURVEY Appendix B (derived from SuiteSparse symbols at
core/operator/unary.py:142-168).  Here every builtin is an explicit JAX
function; typed variants are instantiated per dtype from the domain tables.
"""

import jax.numpy as jnp
import numpy as np

from .. import dtypes as _dt
from ..dtypes import lookup_dtype
from . import ufuncs as uf
from .base import OpBase, ParameterizedUdf, TypedOpBase, _normalize_sig

__all__ = ["UnaryOp", "TypedBuiltinUnaryOp", "TypedUserUnaryOp"]

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


class TypedBuiltinUnaryOp(TypedOpBase):
    __slots__ = ()
    opclass = "UnaryOp"

    def __call__(self, val):
        from .utils import _call_op_unary

        return _call_op_unary(self, val)


class TypedUserUnaryOp(TypedBuiltinUnaryOp):
    __slots__ = ()


def _c_round(x):
    return jnp.where(
        jnp.isfinite(x), jnp.sign(x) * jnp.floor(jnp.abs(x) + type(0.5)(0.5)), x
    ).astype(x.dtype)


def _fpfc_wrap(fn):
    def wrapper(x):
        return fn(x).astype(x.dtype)

    return wrapper


def _same(fn):
    return fn


# name -> (domain list, func, return_type_rule)
# return_type_rule: None = same dtype; a DataType = fixed; callable dtype->dtype
_FC_TO_FP = {_dt.FC32: _dt.FP32, _dt.FC64: _dt.FP64}


def _abs_ret(dt):
    return _FC_TO_FP.get(dt, dt)


_BUILTIN = {
    "identity": (_ALL13, lambda x: x, None),
    "ainv": (_ALL13, uf.gb_ainv, None),
    "minv": (_ALL13, uf.gb_minv, None),
    "abs": (_ALL13, lambda x: x if uf.is_bool(x) else jnp.abs(x), _abs_ret),
    "bnot": (_INT8T, lambda x: ~x, None),
    "lnot": (_D11, lambda x: uf.gb_lnot(x) if uf.is_bool(x) else uf.gb_lnot(x).astype(x.dtype), None),
    "one": (_ALL13, lambda x: jnp.ones_like(x), None),
    # float / complex math
    "sqrt": (_FPFC, jnp.sqrt, None),
    "log": (_FPFC, jnp.log, None),
    "exp": (_FPFC, jnp.exp, None),
    "log2": (_FPFC, jnp.log2, None),
    "sin": (_FPFC, jnp.sin, None),
    "cos": (_FPFC, jnp.cos, None),
    "tan": (_FPFC, jnp.tan, None),
    "acos": (_FPFC, jnp.arccos, None),
    "asin": (_FPFC, jnp.arcsin, None),
    "atan": (_FPFC, jnp.arctan, None),
    "sinh": (_FPFC, jnp.sinh, None),
    "cosh": (_FPFC, jnp.cosh, None),
    "tanh": (_FPFC, jnp.tanh, None),
    "acosh": (_FPFC, jnp.arccosh, None),
    "asinh": (_FPFC, jnp.arcsinh, None),
    "atanh": (_FPFC, jnp.arctanh, None),
    # signum over all real dtypes (reference FP-only; int extension is a
    # harmless superset that keeps numpy.sign mapping valid for ints)
    "signum": (_D11, jnp.sign, None),
    "ceil": (_FPFC, lambda x: jnp.ceil(x.real).astype(x.dtype) if uf.is_complex(x) else jnp.ceil(x), None),
    "floor": (_FPFC, lambda x: jnp.floor(x.real).astype(x.dtype) if uf.is_complex(x) else jnp.floor(x), None),
    "round": (_FPFC, _c_round, None),
    "trunc": (_FPFC, lambda x: jnp.trunc(x.real).astype(x.dtype) if uf.is_complex(x) else jnp.trunc(x), None),
    "exp2": (_FPFC, jnp.exp2, None),
    "expm1": (_FPFC, jnp.expm1, None),
    "log10": (_FPFC, jnp.log10, None),
    "log1p": (_FPFC, jnp.log1p, None),
    # float only
    "lgamma": (_FP, lambda x: _lgamma(x), None),
    "tgamma": (_FP, lambda x: _tgamma(x), None),
    "erf": (_FP, lambda x: _erf(x), None),
    "erfc": (_FP, lambda x: _erfc(x), None),
    "frexpx": (_FP, uf.gb_frexpx, None),
    "frexpe": (_FP, uf.gb_frexpe, None),
    "cbrt": (_FP, jnp.cbrt, None),
    # complex
    "conj": (_FC, jnp.conj, None),
    "creal": (_FC, jnp.real, _abs_ret),
    "cimag": (_FC, jnp.imag, _abs_ret),
    "carg": (_FC, lambda x: jnp.angle(x).astype(_FC_TO_FP[lookup_dtype(x.dtype)].np_type), _abs_ret),
    # bool-returning
    "isinf": (_FPFC, lambda x: jnp.isinf(x), _dt.BOOL),
    "isnan": (_FPFC, lambda x: jnp.isnan(x), _dt.BOOL),
    "isfinite": (_FPFC, lambda x: jnp.isfinite(x), _dt.BOOL),
}

# positional unaries: value ignored; engine substitutes the element index
_POSITIONAL = {
    "positioni": ("i", 0),
    "positioni1": ("i", 1),
    "positionj": ("j", 0),
    "positionj1": ("j", 1),
}


def _lgamma(x):
    from jax.scipy.special import gammaln

    return gammaln(x).astype(x.dtype)


def _tgamma(x):
    from jax.scipy.special import gamma

    return gamma(x).astype(x.dtype)


def _erf(x):
    from jax.scipy.special import erf

    return erf(x).astype(x.dtype)


def _erfc(x):
    from jax.scipy.special import erfc

    return erfc(x).astype(x.dtype)


class UnaryOp(OpBase):
    """A function that maps one value to one value (reference unary.py:130)."""

    __slots__ = ()
    _modname = "unary"
    _typed_class = TypedBuiltinUnaryOp

    def __call__(self, val):
        from .utils import _call_op_unary

        return _call_op_unary(self, val)

    @classmethod
    def _build_builtin(cls, name, domains, func, ret_rule, positional=None):
        op = cls(name)
        op._positional = positional
        if name in ("identity", "one"):
            op._udt_func = func  # UDT-capable
        for dt in domains:
            rt = _ret(ret_rule, dt)
            op._add(TypedBuiltinUnaryOp(op, name, dt, rt, func))
        return op

    def _build_udt_typed(self, dtype, dtype2):
        func = self._udt_func
        if self._positional is not None:
            return TypedBuiltinUnaryOp(self, self.name, dtype, _dt.INT64, func)
        rt = type(self)._infer_return_dtype(func, dtype) if not dtype._is_udt else dtype
        cls = TypedUserUnaryOp if self._anonymous or not self._typed_ops else TypedBuiltinUnaryOp
        return cls(self, self.name, dtype, rt, func)

    @classmethod
    def register_anonymous(cls, func, name=None, *, parameterized=False, is_udt=False):
        if parameterized:
            return ParameterizedUnaryOp(name, func, anonymous=True, is_udt=is_udt)
        _normalize_sig(func, 1, "UnaryOp")
        op = cls(name if name is not None else getattr(func, "__name__", "unary_op"), anonymous=True)
        op._udt_func = _wrap_user_unary(func)
        if not is_udt:
            for dt in _ALL13:
                try:
                    typed = op._build_udt_typed(dt, dt)
                except Exception:  # noqa: BLE001
                    continue
                op._typed_ops[dt] = typed
        return op

    @classmethod
    def register_new(cls, name, func, *, parameterized=False, is_udt=False, lazy=False):
        from .utils import _register_into_namespace

        op = cls.register_anonymous(func, name, parameterized=parameterized, is_udt=is_udt)
        op._anonymous = False
        if parameterized:
            op._anonymous = False
        _register_into_namespace("unary", name, op)
        return op


class ParameterizedUnaryOp(ParameterizedUdf):
    __slots__ = "func", "_is_udt_flag"

    def __init__(self, name, func, *, anonymous=False, is_udt=False):
        super().__init__(name if name is not None else getattr(func, "__name__", "unary_op"), anonymous)
        self.func = func
        self._is_udt_flag = is_udt

    def __call__(self, *args, **kwargs):
        inner = self.func(*args, **kwargs)
        return UnaryOp.register_anonymous(inner, self.name, is_udt=self._is_udt_flag)


def _wrap_user_unary(func):
    def wrapper(x):
        out = func(x)
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


def _initialize_builtins(namespace):
    """Instantiate all builtin unary ops into the given namespace dict."""
    ops = {}
    for name, (domains, func, ret_rule) in _BUILTIN.items():
        ops[name] = UnaryOp._build_builtin(name, domains, func, ret_rule)
    for name, pos in _POSITIONAL.items():
        op = UnaryOp(name)
        op._positional = pos
        for dt in _POS:
            op._add(TypedBuiltinUnaryOp(op, name, dt, dt, None))
        ops[name] = op
    namespace.update(ops)
    return ops
