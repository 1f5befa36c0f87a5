"""Scalar: GrB_Scalar with the reference's dual representation.

Reference core/scalar.py:44 — a Scalar is either a "GrB scalar"
(is_cscalar=False) or a "C scalar" (is_cscalar=True) with Python-side
emptiness.  On TPU both share the same store: a () values array plus a ()
presence flag; `is_cscalar` is kept as a visible attribute for API parity
(both representations must behave identically — the reference CI proves this
with its "bizarro scalars" pass, SURVEY §4).
"""

import numpy as np

from ..exceptions import EmptyObject
from .base import BaseExpression, BaseType
from .dtypes import lookup_dtype, unify
from .utils import output_type, _output_types


def _is_scalar_like(value):
    return isinstance(value, (int, float, bool, complex, np.number, np.bool_,
                              np.void))


class Scalar(BaseType):
    __slots__ = "_is_cscalar"
    ndim = 0
    shape = ()
    _is_scalar = True

    def __init__(self, dtype, *, is_cscalar=False, name=None):
        super().__init__()
        import jax.numpy as jnp

        from .engine import store as st

        self.dtype = lookup_dtype(dtype)
        self._name = name
        self._is_cscalar = bool(is_cscalar)
        self._set_store(st.zeros_values((), self.dtype), jnp.zeros((), bool))

    def __call__(self, *optional, mask=None, accum=None, replace=False,
                 input_mask=None, **opts):
        # reference error contract (tests/test_scalar.py:223-248)
        from graphblas_tpu import replace as replace_singleton

        if replace or replace_singleton in optional:
            raise TypeError(
                "'replace' argument may not be True for Scalar")
        if mask is not None:
            raise TypeError("Mask not allowed for Scalars")
        if input_mask is not None:
            raise TypeError("input_mask not allowed for Scalars")
        return super().__call__(*optional, mask=mask, accum=accum,
                                replace=replace, input_mask=input_mask,
                                **opts)

    def __invert__(self):
        from graphblas_tpu import unary

        if self.dtype.name != "BOOL":
            raise TypeError(
                "The invert operator, `~x`, is only supported for BOOL "
                f"dtype, not {self.dtype.name}")
        return unary.lnot(self)

    # ------------------------------------------------------------------ #
    @classmethod
    def _empty(cls, dtype, shape=(), name=None):
        return cls(dtype, name=name)

    @classmethod
    def _from_store(cls, dtype, vals, valid, name=None, is_cscalar=False):
        s = cls.__new__(cls)
        BaseType.__init__(s)
        s.dtype = lookup_dtype(dtype)
        s._name = name
        s._is_cscalar = is_cscalar
        s._set_store(vals, valid)
        return s

    def _new_like(self, dtype, name=None):
        return Scalar(dtype, is_cscalar=self._is_cscalar, name=name)

    @classmethod
    def from_value(cls, value, dtype=None, *, is_cscalar=False, name=None):
        if isinstance(value, (Scalar, BaseExpression)):
            if dtype is None:
                dtype = value.dtype
            value = value.value if isinstance(value, Scalar) else value.new().value
        if dtype is None:
            if not _is_scalar_like(value):
                raise TypeError(f"Bad value for Scalar: {type(value)}")
            if isinstance(value, np.void):
                dtype = lookup_dtype(value.dtype)
            else:
                dtype = lookup_dtype(type(value))
        s = cls(dtype, is_cscalar=is_cscalar, name=name)
        if value is not None:
            s.value = value
        return s

    @property
    def is_cscalar(self):
        return self._is_cscalar

    @property
    def is_grbscalar(self):
        return not self._is_cscalar

    @property
    def _is_empty(self):
        return not bool(np.asarray(self._valid))

    @property
    def is_empty(self):
        return self._is_empty

    @property
    def value(self):
        if self._is_empty:
            return None
        from .engine import store as st

        host = st.device_values_to_np(self._vals, self.dtype, ())
        if self.dtype._is_udt:
            return host
        return host[()]

    @value.setter
    def value(self, val):
        import jax.numpy as jnp

        from .engine import store as st

        if val is None or (isinstance(val, Scalar) and val._is_empty):
            self.clear()
            return
        if isinstance(val, Scalar):
            val = val.value
        if isinstance(val, BaseExpression):
            val = val.new().value
        arr = np.array(val, self.dtype.np_type)
        self._set_store(st.np_values_to_device(arr, self.dtype), jnp.ones((), bool))

    def _update_from_value(self, value, accum=None):
        if accum is None:
            self.value = value
            return
        if self._is_empty:
            self.value = value
            return
        from .operator.utils import get_typed_op

        vdt = lookup_dtype(type(value)) if _is_scalar_like(value) else self.dtype
        op = get_typed_op(accum, self.dtype, vdt, kind="binary")
        import jax.numpy as jnp

        merged = op._jax_func(
            jnp.asarray(self._vals).astype(op.type.np_type),
            jnp.asarray(np.array(value, op.type2.np_type)),
        )
        self.value = np.asarray(merged).astype(self.dtype.np_type)[()]

    # ------------------------------------------------------------------ #
    @property
    def nvals(self):
        return 0 if self._is_empty else 1

    @property
    def _nvals(self):
        return self.nvals

    def clear(self):
        import jax.numpy as jnp

        from .engine import store as st

        self._set_store(st.zeros_values((), self.dtype), jnp.zeros((), bool))

    def dup(self, dtype=None, *, clear=False, is_cscalar=None, name=None, **opts):
        if is_cscalar is None:
            is_cscalar = self._is_cscalar
        dt = self.dtype if dtype is None else lookup_dtype(dtype)
        s = Scalar(dt, is_cscalar=is_cscalar, name=name)
        if not clear and not self._is_empty:
            s.value = np.array(self.value).astype(dt.np_type)[()] if not dt._is_udt else self.value
        return s

    def get(self, default=None):
        return default if self._is_empty else self.value

    def isequal(self, other, *, check_dtype=False):
        if not isinstance(other, Scalar):
            if other is None:
                return self._is_empty
            if not _is_scalar_like(other):
                raise TypeError(f"Bad type for isequal: {type(other)}")
            other = Scalar.from_value(other)
            if check_dtype:
                check_dtype = False  # inferred dtype; don't enforce
        if check_dtype and self.dtype != other.dtype:
            return False
        if self._is_empty or other._is_empty:
            return self._is_empty and other._is_empty
        a, b = self.value, other.value
        if self.dtype._is_udt:
            return bool(np.array_equal(a, b))
        return bool(a == b)

    def isclose(self, other, *, rel_tol=1e-7, abs_tol=0.0, check_dtype=False):
        if not isinstance(other, Scalar):
            if other is None:
                return self._is_empty
            if not _is_scalar_like(other):
                raise TypeError(f"Bad type for isclose: {type(other)}")
            other = Scalar.from_value(other)
            if check_dtype:
                check_dtype = False
        if check_dtype and self.dtype != other.dtype:
            return False
        if self._is_empty or other._is_empty:
            return self._is_empty and other._is_empty
        return bool(np.isclose(self.value, other.value, rtol=rel_tol, atol=abs_tol))

    # ------------------------------------------------------------------ #
    # element-wise ops over 0-d stores
    def _ewise(self, variant, other, op, ldef=None, rdef=None):
        from . import execute
        from .operator.utils import get_typed_op

        if not isinstance(other, Scalar):
            if _is_scalar_like(other):
                other = Scalar.from_value(other)
            else:
                raise TypeError(f"Bad type for scalar ewise: {type(other)}")
        method = {"add": "ewise_add", "mult": "ewise_mult", "union": "ewise_union"}[variant]
        op = get_typed_op(op, self.dtype, other.dtype, kind="binary")
        if variant == "union":
            ldt = lookup_dtype(type(ldef)) if _is_scalar_like(ldef) else self.dtype
            rdt = lookup_dtype(type(rdef)) if _is_scalar_like(rdef) else other.dtype
            import jax.numpy as jnp

            from ..exceptions import EmptyObject

            for d in (ldef, rdef):
                if isinstance(d, Scalar) and d.is_empty:
                    raise EmptyObject(
                        "Empty Scalar is not allowed as an ewise_union "
                        "default")
            ldyn = jnp.asarray(np.array(ldef if not isinstance(ldef, Scalar) else ldef.value,
                                        op.type.np_type))
            rdyn = jnp.asarray(np.array(rdef if not isinstance(rdef, Scalar) else rdef.value,
                                        op.type2.np_type))
            args = [self, other, ldyn, rdyn]
            statics = ("union", self.dtype, other.dtype, False, False, ldt, rdt,
                       False, False)
        else:
            args = [self, other]
            statics = (variant, self.dtype, other.dtype, False, False, None, None,
                       False, False)
        return BaseExpression(method, op, args, statics, execute.T_ewise,
                              op.return_type, (), Scalar)

    def ewise_add(self, other, op="plus"):
        return self._ewise("add", other, op)

    def ewise_mult(self, other, op="times"):
        return self._ewise("mult", other, op)

    def ewise_union(self, other, op, left_default, right_default):
        return self._ewise("union", other, op, left_default, right_default)

    def apply(self, op, right=None, *, left=None):
        from . import execute
        from .operator.base import find_opclass
        from .operator.utils import get_typed_op

        import jax.numpy as jnp

        if left is None and right is None:
            op = get_typed_op(op, self.dtype, kind="unary")
            statics = (self.dtype, False)
            return BaseExpression("apply", op, [self], statics,
                                  execute.T_apply_unary, op.return_type, (), Scalar)
        if left is not None and right is not None:
            raise TypeError("Cannot provide both `left` and `right` to apply")
        bound = left if left is not None else right
        if isinstance(bound, Scalar):
            bdt = bound.dtype
            bval = jnp.asarray(np.array(bound.value, bdt.np_type))
        else:
            bdt = lookup_dtype(type(bound))
            bval = jnp.asarray(np.array(bound, bdt.np_type))
        is_left = left is not None
        if is_left:
            op = get_typed_op(op, bdt, self.dtype, is_left_scalar=True, kind="binary")
        else:
            op = get_typed_op(op, self.dtype, bdt, is_right_scalar=True, kind="binary")
        statics = (self.dtype, bdt, is_left, False)
        return BaseExpression("apply", op, [self, bval], statics,
                              execute.T_apply_bound, op.return_type, (), Scalar)

    def select(self, op, thunk=None):
        """Keep the value when the value-family select predicate holds.
        Reference scalar select surface (tests/test_scalar.py:550)."""
        from . import execute
        from .operator.base import find_opclass
        from .operator.utils import get_typed_op

        if isinstance(op, BaseExpression):
            from graphblas_tpu.select import _match_expr

            match = _match_expr(self, op)
            if match is None:
                raise TypeError(
                    "Unable to interpret select expression; use a SelectOp")
            op, thunk = match
        if thunk is None:
            thunk = False
        if isinstance(thunk, Scalar):
            tdt = thunk.dtype
            tv = thunk.value
        else:
            tdt = lookup_dtype(type(thunk))
            tv = thunk
        typed = get_typed_op(op, self.dtype, tdt, kind="select")
        _, oc = find_opclass(typed)
        if oc not in ("SelectOp", "IndexUnaryOp"):
            raise TypeError(f"select requires a SelectOp; got {oc}")
        if typed._positional is not None:
            raise TypeError("positional select ops are not defined for Scalar")
        import jax.numpy as jnp

        tval = jnp.asarray(np.array(tv, tdt.np_type))
        statics = (self.dtype, tdt)
        return BaseExpression("select", typed, [self, tval], statics,
                              execute.T_select_scalar, self.dtype, (), Scalar)

    # ------------------------------------------------------------------ #
    def wait(self, how="materialize"):
        return super().wait(how)

    def __repr__(self):
        from . import formatting

        return formatting.format_scalar(self)

    def _repr_html_(self):
        from . import formatting

        return formatting.format_scalar_html(self)

    def __bool__(self):
        if self._is_empty:
            return False
        return bool(self.value)

    def __int__(self):
        if self._is_empty:
            raise TypeError("Scalar is empty")
        return int(self.value)

    def __float__(self):
        if self._is_empty:
            raise TypeError("Scalar is empty")
        return float(self.value)

    def __complex__(self):
        if self._is_empty:
            raise TypeError("Scalar is empty")
        return complex(self.value)

    def __index__(self):
        if not self.dtype.is_int and not self.dtype.is_bool:
            raise TypeError("Scalar object cannot be interpreted as an integer")
        return int(self.value)

    def __array__(self, dtype=None, **kwargs):
        v = self.value
        if dtype is None:
            dtype = self.dtype.np_type
        return np.array(v, dtype)

    def __reduce__(self):
        return (_deserialize_scalar,
                (self.dtype.name if not self.dtype._is_udt else self.dtype,
                 self.value, self._is_cscalar, self._name))

    @property
    def _as_vector(self):
        raise NotImplementedError

    def _as_scalar_index(self):
        return int(self.value)


def _deserialize_scalar(dtype, value, is_cscalar, name):
    s = Scalar(dtype, is_cscalar=is_cscalar, name=name)
    if value is not None:
        s.value = value
    return s


def _as_scalar(value, dtype=None, *, is_cscalar=False):
    """Coerce to Scalar (reference core/scalar.py _as_scalar)."""
    if isinstance(value, Scalar):
        if dtype is not None and value.dtype != lookup_dtype(dtype):
            return Scalar.from_value(value.value, dtype, is_cscalar=is_cscalar)
        return value
    return Scalar.from_value(value, dtype, is_cscalar=is_cscalar)


_output_types[Scalar] = Scalar


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from .utils import x64_methods as _x64_methods  # noqa: E402
Scalar = _x64_methods(Scalar)
