"""Semiring: (add monoid, multiply binaryop) pairs (reference semiring.py:155).

The ~1400 typed builtin semirings of the reference (grammar at
semiring.py:170-205) are generated *lazily*: the ``gb.semiring`` namespace
module parses names like ``min_plus`` / ``lor_land`` / ``plus_firstj1`` on
attribute access and composes them with :func:`get_semiring`, caching the
result.  Any (monoid, binaryop) pair — builtin or user-defined — composes the
same way, which is what lets every semiring lower to the same fused TPU
kernels.
"""

from .. import dtypes as _dt
from .base import OpBase, ParameterizedUdf, TypedOpBase

__all__ = ["Semiring", "TypedBuiltinSemiring", "get_semiring_obj"]


class TypedBuiltinSemiring(TypedOpBase):
    __slots__ = "monoid", "binaryop"
    opclass = "Semiring"

    def __init__(self, parent, name, type_, monoid_typed, binaryop_typed, type2=None):
        super().__init__(
            parent, name, type_, monoid_typed.return_type, None, type2=type2
        )
        self.monoid = monoid_typed
        self.binaryop = binaryop_typed

    @property
    def is_positional(self):
        return self.binaryop.is_positional

    @property
    def _positional(self):
        return self.binaryop._positional

    def __call__(self, left, right=None):
        from .utils import _call_op

        return _call_op(self, left, right)


class TypedUserSemiring(TypedBuiltinSemiring):
    __slots__ = ()


class Semiring(OpBase):
    __slots__ = "_monoid", "_binaryop"
    _modname = "semiring"
    _typed_class = TypedBuiltinSemiring

    def __init__(self, name, monoid=None, binaryop=None, *, anonymous=False):
        super().__init__(name, anonymous=anonymous)
        self._monoid = monoid
        self._binaryop = binaryop
        if binaryop is not None:
            self._positional = binaryop._positional

    @property
    def monoid(self):
        return self._monoid

    @property
    def binaryop(self):
        return self._binaryop

    def __call__(self, left, right=None):
        from .utils import _call_op

        return _call_op(self, left, right)

    def __getitem__(self, type_):
        if type(type_) is tuple:
            return super().__getitem__(type_)
        type_ = _dt.lookup_dtype(type_)
        if type_ in self._typed_ops:
            return self._typed_ops[type_]
        # Build on demand for this dtype
        typed = self._build_typed(type_, type_)
        if typed is None:
            from .coercions import bitwise_input_coercion

            target = bitwise_input_coercion(self, type_)
            if target is not None:
                # signed-int inputs to bitwise semirings coerce to unsigned
                # (reference semiring.py:453-460)
                typed = self[target]
                self._typed_ops[type_] = typed
                return typed
            if self.is_positional:
                return self[_dt.INT64]
            raise KeyError(f"{self.name} does not work with {type_}")
        self._typed_ops[type_] = typed
        return typed

    def _build_typed(self, dtype, dtype2):
        try:
            if self._binaryop._is_udt or dtype._is_udt or dtype2._is_udt:
                typed_mult = self._binaryop._compile_udt(dtype, dtype2)
            elif dtype in self._binaryop._typed_ops and dtype is dtype2:
                typed_mult = self._binaryop._typed_ops[dtype]
            else:
                from .utils import get_typed_op

                typed_mult = get_typed_op(self._binaryop, dtype, dtype2)
        except (KeyError, TypeError):
            return None
        mult_ret = typed_mult.return_type
        try:
            typed_add = self._monoid[mult_ret]
        except KeyError:
            # SuiteSparse boolean renaming: plus→lor, times/min→land, max→lor
            # when the additive monoid meets BOOL products (so e.g.
            # plus_pair works on a BOOL adjacency matrix).
            typed_add = None
            if mult_ret == _dt.BOOL:
                from .coercions import bool_monoid_substitute

                sub = bool_monoid_substitute(self._monoid)
                if sub is not None:
                    try:
                        typed_add = sub[_dt.BOOL]
                    except KeyError:
                        typed_add = None
            elif (not mult_ret._is_udt
                  and self._monoid.name in ("eq", "lor", "land", "lxor", "lxnor")
                  and _dt.BOOL in self._monoid._typed_ops):
                # BOOL-only monoid (eq/lor/land/...) with numeric products:
                # products cast to BOOL before reduction (reference
                # semiring.py:443-451 coerces these cells to the BOOL ring)
                typed_add = self._monoid._typed_ops[_dt.BOOL]
            if typed_add is None:
                return None
        cls = TypedUserSemiring if self._anonymous else TypedBuiltinSemiring
        return cls(self, self.name, dtype, typed_add, typed_mult, type2=dtype2)

    def _compile_udt(self, dtype, dtype2):
        key = (dtype, dtype2)
        if key in self._typed_ops:
            return self._typed_ops[key]
        typed = self._build_typed(dtype, dtype2)
        if typed is None:
            raise KeyError(f"{self.name} does not work with ({dtype}, {dtype2})")
        self._typed_ops[key] = typed
        return typed

    @property
    def _is_udt(self):
        return self._binaryop._is_udt

    @property
    def types(self):
        # materialize the full table for introspection
        for dt in list(self._binaryop._typed_ops):
            if not isinstance(dt, tuple) and dt not in self._typed_ops:
                typed = self._build_typed(dt, dt)
                if typed is not None:
                    self._typed_ops[dt] = typed
        return {
            t: op.return_type
            for t, op in self._typed_ops.items()
            if not isinstance(t, tuple)
        }

    @classmethod
    def register_anonymous(cls, monoid, binaryop, name=None):
        from .binary import ParameterizedBinaryOp
        from .monoid import Monoid, _ParameterizedMonoid

        if isinstance(monoid, _ParameterizedMonoid) or isinstance(
            binaryop, ParameterizedBinaryOp
        ):
            return _ParameterizedSemiring(name, monoid, binaryop, anonymous=True)
        if not isinstance(monoid, Monoid):
            raise TypeError(f"monoid must be a Monoid; got {type(monoid)}")
        rv = cls(
            name if name is not None else f"{monoid.name}_{binaryop.name}",
            monoid,
            binaryop,
            anonymous=True,
        )
        return rv

    @classmethod
    def register_new(cls, name, monoid, binaryop, *, lazy=False):
        from .utils import _register_into_namespace

        ring = cls.register_anonymous(monoid, binaryop, name)
        ring._anonymous = False
        _register_into_namespace("semiring", name, ring)
        return ring


class _ParameterizedSemiring(ParameterizedUdf):
    __slots__ = "monoid", "binaryop"

    def __init__(self, name, monoid, binaryop, *, anonymous=False):
        super().__init__(
            name if name is not None else f"{monoid.name}_{binaryop.name}", anonymous
        )
        self.monoid = monoid
        self.binaryop = binaryop

    def __call__(self, *args, **kwargs):
        mono = self.monoid
        binop = self.binaryop
        if isinstance(mono, ParameterizedUdf):
            mono = mono(*args, **kwargs)
        if isinstance(binop, ParameterizedUdf):
            binop = binop(*args, **kwargs)
        return Semiring.register_anonymous(mono, binop, self.name)


_semiring_cache = {}


def get_semiring_obj(monoid, binaryop, name=None):
    """Compose (and cache) a Semiring from a monoid and a binaryop.

    Reference: core/operator/utils.py:135 (get_semiring).
    """
    from .base import find_opclass

    monoid, mon_class = find_opclass(monoid)
    binaryop, bin_class = find_opclass(binaryop)
    if isinstance(monoid, TypedOpBase):
        monoid = monoid.parent
    if isinstance(binaryop, TypedOpBase):
        binaryop = binaryop.parent
    if mon_class == "BinaryOp" and getattr(monoid, "monoid", None) is not None:
        monoid = monoid.monoid
        mon_class = "Monoid"
    if mon_class != "Monoid":
        raise TypeError(f"monoid argument must be a Monoid; got {mon_class} ({monoid})")
    if bin_class == "Monoid":
        binaryop = binaryop.binaryop
        bin_class = "BinaryOp"
    if bin_class != "BinaryOp":
        raise TypeError(f"binaryop argument must be a BinaryOp; got {bin_class} ({binaryop})")
    key = (id(monoid), id(binaryop))
    cached = _semiring_cache.get(key)
    if cached is not None and (name is None or cached.name == name):
        return cached
    ring = Semiring(
        name if name is not None else f"{monoid.name}_{binaryop.name}",
        monoid,
        binaryop,
        anonymous=monoid._anonymous or binaryop._anonymous,
    )
    if name is None:
        _semiring_cache[key] = ring
    return ring
