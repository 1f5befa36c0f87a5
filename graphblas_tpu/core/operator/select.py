"""SelectOp: a BOOL-returning IndexUnaryOp used for structural filtering.

Reference: core/operator/select.py:70-122 and select/__init__.py:1-5 —
SelectOp is literally an IndexUnaryOp restricted to BOOL return; the builtin
select ops share names (tril, triu, diag, offdiag, col/row comparisons,
value comparisons) with the indexunary namespace.
"""

from .. import dtypes as _dt
from .base import OpBase, ParameterizedUdf, TypedOpBase
from .indexunary import (
    _BUILTIN,
    IndexUnaryOp,
    TypedBuiltinIndexUnaryOp,
    _POSITIONAL_NAMES,
)

__all__ = ["SelectOp", "TypedBuiltinSelectOp"]


class TypedBuiltinSelectOp(TypedBuiltinIndexUnaryOp):
    __slots__ = ()
    opclass = "SelectOp"

    def __call__(self, val, thunk=None):
        if thunk is None:
            thunk = False
        if not hasattr(val, "select"):
            # literal scalar first arg: select.valuene(5, s) coerces to a
            # Scalar (reference tests/test_scalar.py:553)
            from ..scalar import Scalar

            val = Scalar.from_value(val)
        return val.select(self, thunk)


class TypedUserSelectOp(TypedBuiltinSelectOp):
    __slots__ = ()


class SelectOp(IndexUnaryOp):
    __slots__ = ()
    _modname = "select"
    _typed_class = TypedBuiltinSelectOp

    def __call__(self, val, thunk=None):
        if thunk is None:
            thunk = False
        if not hasattr(val, "select"):
            # literal scalar first arg: select.valuene(5, s) coerces to a
            # Scalar (reference tests/test_scalar.py:553)
            from ..scalar import Scalar

            val = Scalar.from_value(val)
        return val.select(self, thunk)

    @classmethod
    def _from_indexunary(cls, iop):
        """Clone a BOOL-returning IndexUnaryOp as a SelectOp."""
        sel = cls(iop.name, anonymous=iop._anonymous)
        sel._positional = iop._positional
        sel._udt_func = iop._udt_func
        for dt, typed in iop._typed_ops.items():
            if isinstance(dt, tuple):
                continue
            if typed.return_type != _dt.BOOL:
                continue
            sel._add(
                TypedBuiltinSelectOp(sel, iop.name, dt, _dt.BOOL, typed._jax_func)
            )
        return sel

    def _build_udt_typed(self, dtype, dtype2):
        typed = super()._build_udt_typed(dtype, dtype2)
        if typed.return_type != _dt.BOOL:
            raise ValueError(
                f"SelectOp {self.name} must return BOOL; got {typed.return_type}"
            )
        return TypedUserSelectOp(
            self, self.name, dtype, _dt.BOOL, typed._jax_func, type2=dtype2
        )

    @classmethod
    def register_anonymous(cls, func, name=None, *, parameterized=False, is_udt=False):
        if parameterized:
            return ParameterizedSelectOp(name, func, anonymous=True, is_udt=is_udt)
        op = super().register_anonymous.__func__(cls, func, name, is_udt=is_udt)
        bad = [t for t, rt in op.types.items() if rt != _dt.BOOL]
        for t in bad:
            del op._typed_ops[t]
        return op

    @classmethod
    def register_new(cls, name, func, *, parameterized=False, is_udt=False, lazy=False):
        from .utils import _register_into_namespace

        op = cls.register_anonymous(func, name, parameterized=parameterized, is_udt=is_udt)
        op._anonymous = False
        _register_into_namespace("select", name, op)
        return op


class ParameterizedSelectOp(ParameterizedUdf):
    __slots__ = "func", "_is_udt_flag"

    def __init__(self, name, func, *, anonymous=False, is_udt=False):
        super().__init__(
            name if name is not None else getattr(func, "__name__", "select_op"), anonymous
        )
        self.func = func
        self._is_udt_flag = is_udt

    def __call__(self, *args, **kwargs):
        inner = self.func(*args, **kwargs)
        return SelectOp.register_anonymous(inner, self.name, is_udt=self._is_udt_flag)


def _initialize_builtins(namespace):
    ops = {}
    for name, (domains, func, ret_rule, _uses_value) in _BUILTIN.items():
        if ret_rule is not _dt.BOOL:
            continue
        op = SelectOp(name)
        if name in _POSITIONAL_NAMES:
            op._positional = name
            op._udt_func = func
        for dt in domains:
            op._add(TypedBuiltinSelectOp(op, name, dt, _dt.BOOL, func))
        ops[name] = op
    namespace.update(ops)
    return ops
