"""Monoid: associative BinaryOp + identity (reference monoid.py:165).

Builtin monoids follow SURVEY Appendix B: min/max/plus/times over the 10
non-bool real dtypes, lor/land/lxor/lxnor/eq over BOOL, any over all dtypes,
band/bor/bxor/bxnor over the unsigned ints, plus/times/any over complex.
"""

import numpy as np

from .. import dtypes as _dt
from .base import OpBase, ParameterizedUdf, TypedOpBase, _normalize_sig

__all__ = ["Monoid", "TypedBuiltinMonoid"]

_REAL10 = [
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
]
_UINTS = [_dt.UINT8, _dt.UINT16, _dt.UINT32, _dt.UINT64]
_FC = [_dt.FC32, _dt.FC64]
_ALL13 = [_dt.BOOL, *_REAL10, *_FC]


def _identity_min(dt):
    if dt.is_float:
        return np.inf
    if dt.is_bool:
        return True
    return np.iinfo(dt.np_type).max


def _identity_max(dt):
    if dt.is_float:
        return -np.inf
    if dt.is_bool:
        return False
    return np.iinfo(dt.np_type).min


class TypedBuiltinMonoid(TypedOpBase):
    __slots__ = "binaryop", "identity", "_is_idempotent", "_terminal"
    opclass = "Monoid"

    def __init__(self, parent, name, type_, binaryop_typed, identity, *,
                 is_idempotent=False, terminal=None):
        super().__init__(parent, name, type_, binaryop_typed.return_type, binaryop_typed._jax_func)
        self.binaryop = binaryop_typed
        self.identity = identity
        self._is_idempotent = is_idempotent
        self._terminal = terminal

    @property
    def is_idempotent(self):
        return self._is_idempotent

    def __call__(self, left, right=None):
        from .utils import _call_op

        return _call_op(self, left, right)


class TypedUserMonoid(TypedBuiltinMonoid):
    __slots__ = ()


class Monoid(OpBase):
    __slots__ = "_binaryop", "_is_idempotent", "_udt_identity_value"
    _modname = "monoid"
    _typed_class = TypedBuiltinMonoid

    def __init__(self, name, binaryop=None, *, is_idempotent=False, anonymous=False):
        super().__init__(name, anonymous=anonymous)
        self._binaryop = binaryop
        self._is_idempotent = is_idempotent
        self._udt_identity_value = None

    @property
    def binaryop(self):
        return self._binaryop

    @property
    def is_idempotent(self):
        return self._is_idempotent

    @property
    def identities(self):
        return {t: op.identity for t, op in self._typed_ops.items()}

    def __call__(self, left, right=None):
        from .utils import _call_op

        return _call_op(self, left, right)

    def _build_udt_typed(self, dtype, dtype2):
        if self._udt_func is None:
            raise KeyError(f"{self.name} does not work with {dtype}")
        # Only `any` monoid and user monoids registered with is_udt
        typed_binop = self._binaryop._compile_udt(dtype, dtype2)
        identity = self._udt_identity(dtype)
        return TypedUserMonoid(
            self, self.name, dtype, typed_binop, identity,
            is_idempotent=self._is_idempotent,
        )

    def _udt_identity(self, dtype):
        return self._udt_identity_value

    @classmethod
    def _build_builtin(cls, name, binaryop, domains, identity_fn, *,
                       is_idempotent=False, terminal_fn=None):
        mono = cls(name, binaryop, is_idempotent=is_idempotent)
        if name == "any":
            mono._udt_func = binaryop._udt_func
        for dt in domains:
            typed_binop = binaryop._typed_ops.get(dt)
            if typed_binop is None:
                continue
            ident = identity_fn(dt) if callable(identity_fn) else identity_fn
            term = terminal_fn(dt) if callable(terminal_fn) else terminal_fn
            mono._add(
                TypedBuiltinMonoid(
                    mono, name, dt, typed_binop, ident,
                    is_idempotent=is_idempotent, terminal=term,
                )
            )
        return mono

    @classmethod
    def register_anonymous(cls, binaryop, identity, name=None, *, is_idempotent=False):
        from .binary import BinaryOp, ParameterizedBinaryOp

        if isinstance(binaryop, ParameterizedBinaryOp):
            return _ParameterizedMonoid(
                name, binaryop, identity, is_idempotent=is_idempotent, anonymous=True
            )
        if not isinstance(binaryop, BinaryOp):
            raise TypeError(f"binaryop must be a BinaryOp; got {type(binaryop)}")
        mono = cls(
            name if name is not None else f"{binaryop.name}_monoid",
            binaryop,
            is_idempotent=is_idempotent,
            anonymous=True,
        )
        from collections.abc import Mapping

        if isinstance(identity, Mapping):
            identities = {_dt.lookup_dtype(k): v for k, v in identity.items()}
            explicit = True
        else:
            identities = dict.fromkeys(binaryop.types, identity)
            explicit = False
        for dt, ident in identities.items():
            typed_binop = binaryop._typed_ops.get(dt)
            if typed_binop is None:
                if explicit:
                    raise ValueError(f"binaryop {binaryop.name} not defined for {dt}")
                continue
            if typed_binop.return_type != dt:
                if explicit:
                    raise ValueError(
                        f"binaryop {binaryop.name}[{dt}] is not closed (returns "
                        f"{typed_binop.return_type}); cannot be a monoid"
                    )
                continue
            mono._add(
                TypedUserMonoid(mono, mono.name, dt, typed_binop, ident,
                                is_idempotent=is_idempotent)
            )
        if binaryop._udt_func is not None:
            mono._udt_func = binaryop._udt_func
            if not isinstance(identity, Mapping):
                mono._udt_identity_value = identity
        if not mono._typed_ops and mono._udt_func is None:
            raise ValueError(
                f"Unable to create monoid from binaryop {binaryop.name}: no closed dtypes"
            )
        return mono

    @classmethod
    def register_new(cls, name, binaryop, identity, *, is_idempotent=False, lazy=False):
        from .utils import _register_into_namespace

        mono = cls.register_anonymous(binaryop, identity, name, is_idempotent=is_idempotent)
        mono._anonymous = False
        _register_into_namespace("monoid", name, mono)
        return mono


class _ParameterizedMonoid(ParameterizedUdf):
    __slots__ = "binaryop", "identity", "_is_idempotent"

    def __init__(self, name, binaryop, identity, *, is_idempotent=False, anonymous=False):
        super().__init__(name if name is not None else f"{binaryop.name}_monoid", anonymous)
        self.binaryop = binaryop
        self.identity = identity
        self._is_idempotent = is_idempotent

    def __call__(self, *args, **kwargs):
        binop = self.binaryop(*args, **kwargs)
        identity = self.identity
        if callable(identity):
            identity = identity(*args, **kwargs)
        return Monoid.register_anonymous(
            binop, identity, self.name, is_idempotent=self._is_idempotent
        )


def _initialize_builtins(namespace, binary_ns):
    ops = {}
    b = binary_ns
    ops["min"] = Monoid._build_builtin("min", b["min"], _REAL10, _identity_min,
                                       is_idempotent=True, terminal_fn=_identity_max)
    ops["max"] = Monoid._build_builtin("max", b["max"], _REAL10, _identity_max,
                                       is_idempotent=True, terminal_fn=_identity_min)
    ops["plus"] = Monoid._build_builtin("plus", b["plus"], _REAL10 + _FC, 0)
    ops["times"] = Monoid._build_builtin("times", b["times"], _REAL10 + _FC, 1,
                                         terminal_fn=lambda dt: 0 if dt.is_int else None)
    ops["any"] = Monoid._build_builtin("any", b["any"], _ALL13, None, is_idempotent=True)
    ops["lor"] = Monoid._build_builtin("lor", b["lor"], [_dt.BOOL], False,
                                       is_idempotent=True, terminal_fn=True)
    ops["land"] = Monoid._build_builtin("land", b["land"], [_dt.BOOL], True,
                                        is_idempotent=True, terminal_fn=False)
    ops["lxor"] = Monoid._build_builtin("lxor", b["lxor"], [_dt.BOOL], False)
    ops["lxnor"] = Monoid._build_builtin("lxnor", b["lxnor"], [_dt.BOOL], True)
    ops["eq"] = Monoid._build_builtin("eq", b["eq"], [_dt.BOOL], True)
    ops["band"] = Monoid._build_builtin(
        "band", b["band"], _UINTS, lambda dt: int(np.iinfo(dt.np_type).max),
        is_idempotent=True, terminal_fn=0)
    ops["bor"] = Monoid._build_builtin("bor", b["bor"], _UINTS, 0, is_idempotent=True,
                                       terminal_fn=lambda dt: int(np.iinfo(dt.np_type).max))
    ops["bxor"] = Monoid._build_builtin("bxor", b["bxor"], _UINTS, 0)
    ops["bxnor"] = Monoid._build_builtin(
        "bxnor", b["bxnor"], _UINTS, lambda dt: int(np.iinfo(dt.np_type).max))
    namespace.update(ops)
    return ops
