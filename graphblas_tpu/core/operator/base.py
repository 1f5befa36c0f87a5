"""Operator framework: op objects with per-dtype typed variants.

Capability parity with reference graphblas/core/operator/base.py (OpBase:294,
TypedOpBase:229, ParameterizedUdf:275, find_opclass:505).  The reference
derives builtin ops by regex-parsing C library symbols; we instead *define*
every builtin op as a JAX-traceable array function (see the ``_BUILTIN``
tables in unary.py/binary.py/...), which is what makes arbitrary user-defined
ops, monoids and semirings compile to fused TPU kernels with zero extra
machinery — tracing replaces both the numba-UDF path and the SuiteSparse JIT
C-string path of the reference.
"""

import inspect
import re

import numpy as np

from .. import dtypes as _dt
from ..dtypes import lookup_dtype
from ...exceptions import UdfParseError

# Ops that can operate on any dtype (including UDTs) because they don't
# inspect values (or only move them around).
_UDT_CAPABLE = frozenset(
    ["first", "second", "pair", "any", "identity", "one", "oneb"]
)

_POSITIONAL_INT_TYPES = (_dt.INT32, _dt.INT64)


def _hold(value):
    """Wrap a per-dtype constant for identity tables."""
    return value


class TypedOpBase:
    __slots__ = (
        "parent",
        "name",
        "type",
        "type2",
        "return_type",
        "_jax_func",
        "__weakref__",
    )

    def __init__(self, parent, name, type_, return_type, jax_func, type2=None):
        self.parent = parent
        self.name = name
        self.type = type_
        self.type2 = type_ if type2 is None else type2
        self.return_type = return_type
        self._jax_func = jax_func

    @property
    def _carg(self):
        return f"{self.parent._modname}.{self.name}[{self.type.name}]"

    @property
    def is_positional(self):
        return self.parent.is_positional

    @property
    def _positional(self):
        return self.parent._positional

    @property
    def _is_udt(self):
        return self.type._is_udt

    def __repr__(self):
        return f"{self.parent._modname}.{self.name}[{self.type.name}]"

    def __reduce__(self):
        return (_deserialize_typed, (self.parent, self.type.name))

    @property
    def _typed_class(self):
        return type(self).__name__


def _deserialize_typed(parent, typename):
    return parent[typename]


def _op_from_namespace(modname, name):
    import importlib

    obj = importlib.import_module(f"graphblas_tpu.{modname}")
    for part in name.split("."):
        obj = getattr(obj, part)
    return obj


class OpBase:
    __slots__ = (
        "name",
        "_typed_ops",
        "_anonymous",
        "_positional",
        "_udt_func",
        "_custom_dtype",
        "__weakref__",
    )
    _modname = "op"
    _typed_class = TypedOpBase
    _parse_config = None  # unused; kept for structural parity

    def __init__(self, name, *, anonymous=False):
        self.name = name
        self._typed_ops = {}
        self._anonymous = anonymous
        self._positional = None
        self._udt_func = None  # dtype-generic fallback (UDT-capable ops & UDFs)
        self._custom_dtype = None

    # ------------------------------------------------------------------ #
    @property
    def types(self):
        return {
            t: op.return_type
            for t, op in self._typed_ops.items()
            if not isinstance(t, tuple)  # (dtype, dtype2) UDT cache entries
        }

    @property
    def is_positional(self):
        return self._positional is not None

    @property
    def _is_udt(self):
        # An op registered with is_udt=True has only the generic fallback
        return not self._typed_ops and self._udt_func is not None

    def __getitem__(self, type_):
        if type(type_) is tuple:
            from .utils import get_typed_op

            dtype1, dtype2 = (lookup_dtype(t) for t in type_)
            return get_typed_op(self, dtype1, dtype2)
        if not self._is_udt:
            type_ = lookup_dtype(type_)
            if type_ in self._typed_ops:
                return self._typed_ops[type_]
            if self._udt_func is None:
                if self.is_positional:
                    return self._typed_ops[_dt.INT64]
                raise KeyError(f"{self.name} does not work with {type_}")
        dtype = lookup_dtype(type_)
        return self._compile_udt(dtype, dtype)

    def __contains__(self, type_):
        try:
            self[type_]
        except (TypeError, KeyError, ValueError):
            return False
        return True

    def __repr__(self):
        return f"{self._modname}.{self.name}"

    def __call__(self, *args, **kwargs):
        from .utils import _call_op

        return _call_op(self, *args, **kwargs)

    def __reduce__(self):
        if self._anonymous:
            raise TypeError(f"Anonymous op {self.name} is not picklable by name")
        # ops pickle by (namespace, name) like the reference
        # (core/operator/base.py:265-272)
        return (_op_from_namespace, (self._modname, self.name))

    def _add(self, typed_op):
        self._typed_ops[typed_op.type] = typed_op

    def _compile_udt(self, dtype, dtype2):
        """Instantiate a typed op for a dtype not in the builtin table."""
        if self._udt_func is None:
            raise KeyError(f"{self.name} does not work with {dtype}")
        key = (dtype, dtype2)
        if key in self._typed_ops:
            return self._typed_ops[key]
        typed = self._build_udt_typed(dtype, dtype2)
        self._typed_ops[key] = typed
        return typed

    def _build_udt_typed(self, dtype, dtype2):  # overridden per subclass
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    @classmethod
    def _infer_return_dtype(cls, func, *input_dtypes):
        """Trace func on abstract scalars of the given dtypes to get the return dtype.

        Uses ShapeDtypeStruct avals — never concrete arrays — so type
        inference does zero device work.  (Creating a concrete complex
        scalar on a TPU backend enqueues an unsupported transfer whose
        async error poisons the stream for every subsequent op.)
        """
        import jax

        try:
            args = [jax.ShapeDtypeStruct((), t.np_type) for t in input_dtypes]
            with jax.enable_x64(True):
                out = jax.eval_shape(func, *args)
        except Exception as e:  # noqa: BLE001
            raise UdfParseError(
                f"Unable to trace user-defined function for dtypes "
                f"{[t.name for t in input_dtypes]}: {e}"
            ) from e
        return lookup_dtype(np.dtype(out.dtype))


class ParameterizedUdf:
    """A callable that produces an op when called with parameters.

    Reference: core/operator/base.py:275.
    """

    __slots__ = "name", "_anonymous", "__signature__", "__weakref__"

    def __init__(self, name, anonymous):
        self.name = name
        self._anonymous = anonymous

    def __call__(self, *args, **kwargs):
        raise NotImplementedError

    @property
    def _is_udt(self):
        return False


_SS_PREFIX_RE = re.compile(r"^ss\.")


def find_opclass(gb_op):
    """Return (op, opclass_name) for any op-like object."""
    from .agg import Aggregator, TypedAggregator

    if isinstance(gb_op, OpBase):
        opclass = type(gb_op).__name__
    elif isinstance(gb_op, TypedOpBase):
        opclass = gb_op._typed_class
    elif isinstance(gb_op, ParameterizedUdf):
        gb_op = gb_op()  # default parameters
        gb_op, opclass = find_opclass(gb_op)
    elif isinstance(gb_op, Aggregator):
        opclass = "Aggregator"
    elif isinstance(gb_op, TypedAggregator):
        opclass = "Aggregator"
    else:
        from .utils import _builtin_to_op

        if callable(gb_op) and gb_op in _builtin_to_op:
            return find_opclass(_builtin_to_op[gb_op])
        opclass = UNKNOWN_OPCLASS
    # Normalize class names: TypedBuiltinBinaryOp / TypedUserBinaryOp -> BinaryOp
    for prefix in ("Typed", "Builtin", "User"):
        while opclass.startswith(prefix):
            opclass = opclass[len(prefix) :]
    return gb_op, opclass


UNKNOWN_OPCLASS = "UnknownOpClass"


def _normalize_sig(func, nargs_expected, what):
    try:
        sig = inspect.signature(func)
        nparams = len(
            [
                p
                for p in sig.parameters.values()
                if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
            ]
        )
    except (TypeError, ValueError):
        return
    if any(p.kind == p.VAR_POSITIONAL for p in sig.parameters.values()):
        return  # *args-style wrappers (e.g. some jnp ufuncs)
    if nargs_expected is not None and nparams != nargs_expected:
        raise TypeError(
            f"{what} function must take exactly {nargs_expected} positional arguments; "
            f"got {nparams}"
        )
