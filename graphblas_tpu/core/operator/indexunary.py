"""IndexUnaryOp: f(value, row, col, thunk) (reference indexunary.py:80).

All typed funcs have signature ``(val, i, j, thunk) -> result`` over jnp
arrays; for Vectors the engine passes j=0.  SelectOp (select.py) restricts to
BOOL-returning ops.
"""

import jax.numpy as jnp

from .. import dtypes as _dt
from .base import OpBase, ParameterizedUdf, TypedOpBase, _normalize_sig

__all__ = ["IndexUnaryOp", "TypedBuiltinIndexUnaryOp"]

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
_POS = [_dt.INT32, _dt.INT64]


class TypedBuiltinIndexUnaryOp(TypedOpBase):
    __slots__ = ()
    opclass = "IndexUnaryOp"

    def __call__(self, val, thunk=None):
        if thunk is None:
            thunk = False
        return val.apply(self, thunk)


class TypedUserIndexUnaryOp(TypedBuiltinIndexUnaryOp):
    __slots__ = ()


def _value_only(fn):
    def wrapper(val, i, j, thunk):
        return fn(val, thunk)

    return wrapper


def _index_only(fn):
    def wrapper(val, i, j, thunk):
        return fn(i, j, thunk.astype(i.dtype))

    return wrapper


# name -> (domains, func, return_rule, uses_value)
# return_rule: a DataType, None (same as input), or "index" (INT32/INT64)
_BUILTIN = {
    # index-valued
    "rowindex": (_ALL13, _index_only(lambda i, j, t: i + t), "index", False),
    "colindex": (_ALL13, _index_only(lambda i, j, t: j + t), "index", False),
    "diagindex": (_ALL13, _index_only(lambda i, j, t: j - i + t), "index", False),
    # positional bool
    "tril": (_ALL13, _index_only(lambda i, j, t: j <= i + t), _dt.BOOL, False),
    "triu": (_ALL13, _index_only(lambda i, j, t: j >= i + t), _dt.BOOL, False),
    "diag": (_ALL13, _index_only(lambda i, j, t: j == i + t), _dt.BOOL, False),
    "offdiag": (_ALL13, _index_only(lambda i, j, t: j != i + t), _dt.BOOL, False),
    "colle": (_ALL13, _index_only(lambda i, j, t: j <= t), _dt.BOOL, False),
    "colgt": (_ALL13, _index_only(lambda i, j, t: j > t), _dt.BOOL, False),
    "rowle": (_ALL13, _index_only(lambda i, j, t: i <= t), _dt.BOOL, False),
    "rowgt": (_ALL13, _index_only(lambda i, j, t: i > t), _dt.BOOL, False),
    # value comparison bool
    "valueeq": (_ALL13, _value_only(lambda v, t: v == t), _dt.BOOL, True),
    "valuene": (_ALL13, _value_only(lambda v, t: v != t), _dt.BOOL, True),
    "valuegt": (_D11, _value_only(lambda v, t: v > t), _dt.BOOL, True),
    "valuege": (_D11, _value_only(lambda v, t: v >= t), _dt.BOOL, True),
    "valuelt": (_D11, _value_only(lambda v, t: v < t), _dt.BOOL, True),
    "valuele": (_D11, _value_only(lambda v, t: v <= t), _dt.BOOL, True),
}

_POSITIONAL_NAMES = frozenset(
    ["rowindex", "colindex", "diagindex", "tril", "triu", "diag", "offdiag",
     "colle", "colgt", "rowle", "rowgt"]
)


class IndexUnaryOp(OpBase):
    __slots__ = ()
    _modname = "indexunary"
    _typed_class = TypedBuiltinIndexUnaryOp

    def __call__(self, val, thunk=None):
        if thunk is None:
            thunk = False
        return val.apply(self, thunk)

    @classmethod
    def _build_builtin(cls, name, domains, func, ret_rule, typed_cls=None):
        op = cls(name)
        if name in _POSITIONAL_NAMES:
            op._positional = name
            op._udt_func = func
        tc = typed_cls if typed_cls is not None else TypedBuiltinIndexUnaryOp
        for dt in domains:
            if isinstance(ret_rule, str) and ret_rule == "index":
                # index-valued ops exist as INT32 and INT64 variants; default INT64
                rt = _dt.INT64
            elif ret_rule is None:
                rt = dt
            else:
                rt = ret_rule
            op._add(tc(op, name, dt, rt, func))
        return op

    def _build_udt_typed(self, dtype, dtype2):
        func = self._udt_func
        if self.name in _POSITIONAL_NAMES:
            spec = _BUILTIN[self.name]
            rt = _dt.INT64 if isinstance(spec[2], str) else spec[2]
            return TypedBuiltinIndexUnaryOp(self, self.name, dtype, rt, func)
        if dtype._is_udt:
            rt = dtype
        else:
            import jax
            import numpy as np

            # abstract avals only — concrete complex scalars poison a TPU stream
            args = [
                jax.ShapeDtypeStruct((), dtype.np_type),
                jax.ShapeDtypeStruct((), np.int64),
                jax.ShapeDtypeStruct((), np.int64),
                jax.ShapeDtypeStruct(
                    (), dtype2.np_type if not dtype2._is_udt else np.int64),
            ]
            out = jax.eval_shape(func, *args)
            rt = _dt.lookup_dtype(out.dtype)
        return TypedUserIndexUnaryOp(self, self.name, dtype, rt, func, type2=dtype2)

    @classmethod
    def register_anonymous(cls, func, name=None, *, parameterized=False, is_udt=False):
        if parameterized:
            return ParameterizedIndexUnaryOp(name, func, anonymous=True, is_udt=is_udt)
        _normalize_sig(func, 4, "IndexUnaryOp")
        op = cls(
            name if name is not None else getattr(func, "__name__", "indexunary_op"),
            anonymous=True,
        )
        op._udt_func = func
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
        _register_into_namespace("indexunary", name, op)
        # BOOL-returning index unary ops also register as SelectOps (ref behavior)
        try:
            if all(rt == _dt.BOOL for rt in op.types.values()) and op.types:
                from .select import SelectOp

                sel = SelectOp._from_indexunary(op)
                _register_into_namespace("select", name, sel)
        except Exception:  # noqa: BLE001
            pass
        return op


class ParameterizedIndexUnaryOp(ParameterizedUdf):
    __slots__ = "func", "_is_udt_flag"

    def __init__(self, name, func, *, anonymous=False, is_udt=False):
        super().__init__(
            name if name is not None else getattr(func, "__name__", "indexunary_op"),
            anonymous,
        )
        self.func = func
        self._is_udt_flag = is_udt

    def __call__(self, *args, **kwargs):
        inner = self.func(*args, **kwargs)
        return IndexUnaryOp.register_anonymous(inner, self.name, is_udt=self._is_udt_flag)


def _initialize_builtins(namespace):
    ops = {}
    for name, (domains, func, ret_rule, _uses_value) in _BUILTIN.items():
        ops[name] = IndexUnaryOp._build_builtin(name, domains, func, ret_rule)
    namespace.update(ops)
    return ops
