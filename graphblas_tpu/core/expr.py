"""Indexing + updater protocol (reference core/expr.py).

IndexerResolver:100 parses int/slice/list/array/Scalar indices;
AmbiguousAssignOrExtract:288 defers the assign-vs-extract decision to usage
context; Updater:402 carries (mask, accum, replace, input_mask) into
`_update`; InfixExprBase:480 is the base for `x | y`, `x & y`, `x @ y`.
"""

import numpy as np

from ..exceptions import DimensionMismatch, IndexOutOfBound, InvalidIndex, InvalidValue
from .base import BaseExpression, BaseType, _check_mask
from .utils import output_type


class AxisIndex:
    """One resolved axis: either a single int (collapses the axis) or an
    integer array (keeps it).  Reference core/expr.py:25."""

    __slots__ = "size", "index", "dimsize"

    def __init__(self, size, index, dimsize):
        self.size = size  # None -> scalar axis
        self.index = index  # int or np.ndarray[int64]
        self.dimsize = dimsize

    @property
    def is_scalar(self):
        return self.size is None


def _normalize_one(idx, dimsize):
    idx = int(idx)
    if idx < 0:
        idx += dimsize
    if idx < 0 or idx >= dimsize:
        raise IndexOutOfBound(f"index={idx} is out of bounds for size {dimsize}")
    return idx


def resolve_axis(index, dimsize):
    from .scalar import Scalar

    if isinstance(index, Scalar):
        if index.dtype.name.startswith("F"):
            raise TypeError("An integer is required for indexing")
        v = index.value
        if v is None:
            raise TypeError("A value is required for indexing; got an empty Scalar")
        return AxisIndex(None, _normalize_one(v, dimsize), dimsize)
    if isinstance(index, (int, np.integer)):
        return AxisIndex(None, _normalize_one(index, dimsize), dimsize)
    if isinstance(index, slice):
        arr = np.arange(*index.indices(dimsize), dtype=np.int64)
        return AxisIndex(len(arr), arr, dimsize)
    if isinstance(index, (list, tuple, np.ndarray)) or hasattr(index, "__array__"):
        arr = np.asarray(index)
        if arr.dtype == bool:
            raise TypeError("Boolean mask indexing is not supported; use masks (M.S/M.V)")
        if not np.issubdtype(arr.dtype, np.integer):
            raise TypeError(f"Indices must be integers; got {arr.dtype}")
        arr = arr.astype(np.int64, copy=True)
        if arr.ndim != 1:
            raise TypeError(f"Index array must be 1-dimensional; got {arr.ndim}")
        neg = arr < 0
        arr[neg] += dimsize
        if arr.size and ((arr < 0).any() or (arr >= dimsize).any()):
            raise IndexOutOfBound(f"index out of bounds for size {dimsize}")
        return AxisIndex(len(arr), arr, dimsize)
    raise TypeError(f"Invalid index type: {type(index)}")


class IndexerResolver:
    """Reference core/expr.py:100."""

    __slots__ = "obj", "indices"

    def __init__(self, obj, keys):
        self.obj = obj
        # Ellipsis means the whole collection: v[...] / A[...]
        # (reference core/expr.py index parsing)
        if keys is Ellipsis:
            keys = slice(None) if obj.ndim == 1 else (slice(None), slice(None))
        if obj.ndim == 1:
            if isinstance(keys, tuple):
                if len(keys) != 1:
                    raise TypeError(f"Vector is indexed with 1 index; got {len(keys)}")
                keys = keys[0]
            self.indices = [resolve_axis(keys, obj.shape[0])]
        else:
            if not isinstance(keys, tuple):
                if isinstance(keys, (int, np.integer, slice, list, np.ndarray)):
                    raise TypeError(
                        "Matrix requires 2 indices: row and column, e.g. A[3, 5]"
                    )
                raise TypeError(f"Invalid index: {keys!r}")
            if len(keys) != 2:
                raise TypeError(f"Matrix is indexed with 2 indices; got {len(keys)}")
            self.indices = [
                resolve_axis(keys[0], obj.shape[0]),
                resolve_axis(keys[1], obj.shape[1]),
            ]

    @property
    def is_single_element(self):
        return all(ix.is_scalar for ix in self.indices)

    @property
    def out_shape(self):
        return tuple(ix.size for ix in self.indices if not ix.is_scalar)


class Updater:
    """Carries (mask, accum, replace, input_mask) from C(...) to `_update`.

    Reference core/expr.py:402.
    """

    __slots__ = "parent", "kwargs", "opts", "__weakref__"

    def __init__(self, parent, *, mask=None, accum=None, replace=False,
                 input_mask=None, opts=None):
        from .opts import validate_opts

        self.parent = parent
        self.kwargs = {
            "mask": mask,
            "accum": accum,
            "replace": replace,
            "input_mask": input_mask,
        }
        self.opts = validate_opts(opts or {})

    def __repr__(self):
        return f"Updater({self.parent!r}, {self.kwargs})"

    def __lshift__(self, expr):
        self.update(expr)

    def update(self, expr):
        self.parent._update(expr, **self.kwargs, opts=self.opts)

    def __getitem__(self, keys):
        return Assigner(self, IndexerResolver(self.parent, keys))

    def __setitem__(self, keys, obj):
        Assigner(self, IndexerResolver(self.parent, keys)).update(obj)

    def __delitem__(self, keys):
        resolver = IndexerResolver(self.parent, keys)
        self.parent._delete_at(resolver, mask=self.kwargs["mask"])

    @property
    def _mask(self):
        return self.kwargs["mask"]


class Assigner:
    """C(mask)[idx] << value (reference core/expr.py:261)."""

    __slots__ = "updater", "resolver", "is_submask", "__weakref__"

    def __init__(self, updater, resolver, *, is_submask=False):
        self.updater = updater
        self.resolver = resolver
        self.is_submask = is_submask

    def __lshift__(self, obj):
        self.update(obj)

    def update(self, obj):
        kw = self.updater.kwargs
        if kw["input_mask"] is not None:
            raise TypeError("`input_mask` argument may only be used for extract")
        self.updater.parent._assign_at(
            self.resolver,
            obj,
            mask=kw["mask"],
            accum=kw["accum"],
            replace=kw["replace"],
            is_submask=self.is_submask,
        )


class AmbiguousAssignOrExtract:
    """C[idx]: extract when used as a value, assign when used as a target.

    Reference core/expr.py:288.
    """

    __slots__ = "parent", "resolver", "_value", "__weakref__"

    def __init__(self, parent, resolver):
        self.parent = parent
        self.resolver = resolver
        self._value = None

    @property
    def shape(self):
        return self.resolver.out_shape

    @property
    def ndim(self):
        return len(self.resolver.out_shape)

    @property
    def dtype(self):
        return self.parent.dtype

    @property
    def output_type(self):
        from .matrix import Matrix
        from .scalar import Scalar
        from .vector import Vector

        n = self.ndim
        return Scalar if n == 0 else (Vector if n == 1 else Matrix)

    @property
    def name(self):
        return f"{self.parent.name or type(self.parent).__name__}[...]"

    _name_html = name

    def __call__(self, *args, **kwargs):
        """C[idx](mask) — a *submask* assigner (GxB_subassign semantics).

        The mask is region-shaped (matches the extracted/assigned area),
        unlike C(mask)[idx] where the mask is C-shaped.
        Reference: matrix.py:2905+ assign-vs-subassign scoping."""
        updater = self.parent.__call__(*args, _mask_shape=self.resolver.out_shape,
                                       **kwargs)
        return Assigner(updater, self.resolver, is_submask=True)

    def _as_extract_expr(self):
        return self.parent._extract_expr(self.resolver)

    def _extract_with_input_mask(self, input_mask):
        return self.parent._extract_expr(self.resolver, input_mask=input_mask)

    def new(self, dtype=None, *, mask=None, input_mask=None, name=None, **opts):
        if input_mask is not None:
            if mask is not None:
                raise TypeError("mask and input_mask arguments cannot both be given")
            input_mask = _check_mask(input_mask)
            expr = self._extract_with_input_mask(input_mask)
            return expr.new(dtype, name=name)
        expr = self._as_extract_expr()
        return expr.new(dtype, mask=mask, name=name)

    dup = new

    def update(self, obj):
        self.parent._assign_at(self.resolver, obj, mask=None, accum=None,
                               replace=False, is_submask=False)

    def __lshift__(self, obj):
        self.update(obj)

    @property
    def value(self):
        if self.ndim != 0:
            raise AttributeError("only Scalar elements have `.value`")
        return self._get_value(attr="value")

    def _get_value(self, attr=None, default=None):
        expr = self._as_extract_expr()
        return expr._get_value(attr=attr, default=default)

    def __getattr__(self, attr):
        if attr.startswith("_"):
            raise AttributeError(attr)
        return self._get_value(attr=attr)

    def __repr__(self):
        return f"{self.name} (ambiguous assign-or-extract)"

    # Autocompute comparisons/conversions
    def __eq__(self, other):
        return self._get_value() == other

    def __ne__(self, other):
        return self._get_value() != other

    def __bool__(self):
        return bool(self._get_value())

    def __int__(self):
        return int(self._get_value())

    def __float__(self):
        return float(self._get_value())

    def __index__(self):
        return int(self._get_value())

    def __array__(self, dtype=None, **kwargs):
        return self._get_value().__array__(dtype, **kwargs)


class InfixExprBase:
    """Base for x | y, x & y, x @ y (reference core/expr.py:480)."""

    __slots__ = "left", "right", "_expr", "__weakref__"
    _is_scalar = False

    def __init__(self, left, right):
        self.left = left
        self.right = right
        self._expr = None

    def new(self, dtype=None, *, mask=None, name=None, **opts):
        if (
            mask is None
            and self._expr is not None
            and self._expr._value is not None
            and (dtype is None or self._expr._value.dtype == dtype)
        ):
            rv = self._expr._value
            if name is not None:
                rv.name = name
            self._expr._value = None
            return rv
        expr = self._to_expr()
        return expr.new(dtype, mask=mask, name=name, **opts)

    dup = new

    def _to_expr(self):
        if self._expr is None:
            # rely on the default operator of the method
            self._expr = getattr(self.left, self.method_name)(self.right)
        return self._expr

    def _apply_op(self, op):
        """Used by `semiring.plus_times(A @ B)`-style functional calls."""
        from .operator.base import find_opclass

        op, opclass = find_opclass(op)
        if self.method_name in ("ewise_add", "ewise_mult"):
            if opclass not in ("BinaryOp", "Monoid"):
                raise TypeError(
                    f"Bad operator for infix {self._infix!r}: expected BinaryOp or "
                    f"Monoid, got {opclass}"
                )
            return getattr(self.left, self.method_name)(self.right, op)
        if opclass == "Semiring":
            return getattr(self.left, self.method_name)(self.right, op)
        raise TypeError(
            f"Bad operator for infix {self._infix!r}: expected Semiring, got {opclass}"
        )

    def _get_value(self, attr=None, default=None):
        expr = self._to_expr()
        return expr._get_value(attr=attr, default=default)

    @property
    def dtype(self):
        return self._to_expr().dtype

    @property
    def _value(self):
        if self._expr is None:
            return None
        return self._expr._value

    @_value.setter
    def _value(self, val):
        self._to_expr()._value = val

    @property
    def name(self):
        ln = getattr(self.left, "name", None) or type(self.left).__name__
        rn = getattr(self.right, "name", None) or type(self.right).__name__
        return f"{ln} {self._infix} {rn}"

    _name_html = name

    def __repr__(self):
        return f"{self.name}"

    def __getattr__(self, attr):
        if attr.startswith("_") or attr in ("method_name", "left", "right"):
            raise AttributeError(attr)
        return self._get_value(attr=attr)


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from .utils import x64_methods as _x64_methods  # noqa: E402
Updater = _x64_methods(Updater)
Assigner = _x64_methods(Assigner)
AmbiguousAssignOrExtract = _x64_methods(AmbiguousAssignOrExtract)
InfixExprBase = _x64_methods(InfixExprBase)
