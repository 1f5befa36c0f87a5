"""Vector (reference core/vector.py:135).

Storage: bitmap store on device — values (size,), valid bool (size,).
Construction surface parity: from_coo:731, from_pairs:788, from_scalar:836,
from_dense:895, from_dict:1956, to_coo:482, to_dense:948, to_dict:1997,
build:538, diag:620, vxm:1259, reduce:1561, inner:1609, outer:1653,
reposition:1695.
"""

import numpy as np

from ..exceptions import (
    DimensionMismatch,
    EmptyObject,
    IndexOutOfBound,
    InvalidValue,
    OutputNotEmpty,
)
from ._collection import Collection
from .base import BaseExpression, BaseType
from .dtypes import BOOL, INT64, lookup_dtype, unify
from .mask import ComplementedStructuralMask, ComplementedValueMask, StructuralMask, ValueMask
from .operator.base import find_opclass
from .operator.utils import get_typed_op
from .scalar import Scalar, _as_scalar, _is_scalar_like
from .utils import _output_types, ints_to_numpy_buffer, output_type, values_to_numpy_buffer

__all__ = ["Vector"]


class Vector(Collection):
    __slots__ = ("_size", "_ss")
    ndim = 1
    _name_counter = 0

    def __init__(self, dtype=None, size=0, *, name=None):
        super().__init__()
        import jax.numpy as jnp

        from .engine import store as st

        if dtype is None:
            dtype = lookup_dtype("FP64")
        self.dtype = lookup_dtype(dtype)
        size = int(size)
        if size < 0:
            raise ValueError("size must be non-negative")
        self._size = size
        self._name = name
        self._ss = None
        self._set_store(st.zeros_values((size,), self.dtype), jnp.zeros((size,), bool))

    # ------------------------------------------------------------------ #
    @classmethod
    def _empty(cls, dtype, shape, name=None):
        return cls(dtype, shape[0], name=name)

    @classmethod
    def _from_store(cls, dtype, vals, valid, name=None):
        v = cls.__new__(cls)
        BaseType.__init__(v)
        v.dtype = lookup_dtype(dtype)
        v._size = int(valid.shape[0])
        v._name = name
        v._ss = None
        v._set_store(vals, valid)
        return v

    def _new_like(self, dtype, name=None):
        return Vector(dtype, self._size, name=name)

    @property
    def size(self):
        return self._size

    @property
    def shape(self):
        return (self._size,)

    @property
    def _nrows(self):
        return self._size

    # masks
    @property
    def S(self):
        return StructuralMask(self)

    @property
    def V(self):
        return ValueMask(self)

    def __invert__(self):
        from graphblas_tpu import unary

        if self.dtype != BOOL:
            raise TypeError(
                f"The invert operator, `~`, is not supported for {self.dtype.name} dtype."
                "  It is only supported for BOOL dtype."
            )
        return unary.lnot(self)

    def __repr__(self):
        from . import formatting

        return formatting.format_vector(self)

    def _repr_html_(self, mask=None):
        from . import formatting

        return formatting.format_vector_html(self, mask=mask)

    def __sizeof__(self):
        base = object.__sizeof__(self)
        return base + self._size * (self.dtype.np_type.itemsize + 1)

    # ------------------------------------------------------------------ #
    # constructors
    @classmethod
    def from_coo(cls, indices, values=1.0, dtype=None, *, size=None,
                 dup_op=None, name=None):
        """Build from (indices, values).  Reference vector.py:731."""
        indices = ints_to_numpy_buffer(indices, np.int64, name="indices")
        values, dtype = values_to_numpy_buffer(values, dtype)
        if values.ndim == 0:
            values = np.broadcast_to(values, indices.shape)
        elif dtype._is_udt and values.ndim > 1 and not dtype.np_type.names:
            pass
        elif values.ndim != 1 and not dtype._is_udt:
            raise ValueError("values must be 1-dimensional")
        if values.shape[:1] != indices.shape and values.ndim >= 1:
            if len(values) != len(indices):
                raise ValueError(
                    f"`indices` and `values` lengths must match: "
                    f"{len(indices)}, {len(values)}"
                )
        if size is None:
            if len(indices) == 0:
                raise ValueError("No indices provided. Unable to infer size.")
            size = int(indices.max()) + 1
        v = cls(dtype, size, name=name)
        if len(indices):
            v.build(indices, values, dup_op=dup_op)
        return v

    @classmethod
    def from_pairs(cls, pairs, dtype=None, *, size=None, name=None):
        """From iterable of (index, value) pairs.  Reference vector.py:788."""
        pairs = list(pairs)
        if pairs:
            indices = [p[0] for p in pairs]
            values = [p[1] for p in pairs]
        else:
            indices, values = [], []
        if any(len(p) != 2 for p in pairs):
            raise ValueError("All pairs must be length 2")
        return cls.from_coo(np.array(indices, np.int64), values, dtype, size=size,
                            name=name)

    @classmethod
    def from_scalar(cls, value, size, dtype=None, *, name=None):
        """Dense iso vector from a scalar.  Reference vector.py:836."""
        import jax.numpy as jnp

        from .engine import store as st

        if dtype is None:
            if isinstance(value, Scalar):
                dtype = value.dtype
            else:
                _, dtype = values_to_numpy_buffer(value, None)
        dtype = lookup_dtype(dtype)
        if isinstance(value, Scalar):
            if value._is_empty:
                raise EmptyObject("Scalar is empty; cannot create Vector from it")
            value = value.value
        v = cls(dtype, size, name=name)
        v._set_store(st.full_values((size,), dtype, value), jnp.ones((size,), bool))
        return v

    @classmethod
    def from_dense(cls, values, missing_value=None, dtype=None, *, name=None):
        """From a dense array, optionally with a sentinel for missing.
        Reference vector.py:895."""
        import jax.numpy as jnp

        from .engine import store as st

        values, dtype = values_to_numpy_buffer(values, dtype)
        if values.ndim == 0:
            raise TypeError("values must be an array, not a scalar")
        if values.ndim != 1 and not dtype._is_udt:
            raise TypeError("values must be 1-dimensional for Vector.from_dense")
        size = values.shape[0]
        v = cls(dtype, size, name=name)
        dev = st.np_values_to_device(values, dtype)
        if missing_value is None:
            valid = jnp.ones((size,), bool)
        else:
            valid = jnp.asarray(values != missing_value)
        v._set_store(dev, valid)
        return v

    @classmethod
    def from_dict(cls, d, dtype=None, *, size=None, name=None):
        """Reference vector.py:1956."""
        indices = np.fromiter(d.keys(), dtype=np.int64, count=len(d))
        values = list(d.values())
        if size is None and len(d) == 0:
            raise ValueError("Unable to infer size from an empty dict")
        return cls.from_coo(indices, values if values else np.array([], np.float64),
                            dtype, size=size, name=name)

    def build(self, indices, values, *, dup_op=None, clear=False, size=None):
        """Reference vector.py:538."""
        import jax.numpy as jnp

        from .engine import store as st

        if size is not None:
            raise TypeError("`size` keyword arg is not supported (resize first)")
        if not clear and self.nvals > 0:
            raise OutputNotEmpty("Vector already contains values; use clear=True")
        indices = ints_to_numpy_buffer(indices, np.int64, name="indices")
        values, vdtype = values_to_numpy_buffer(values, self.dtype)
        if values.ndim == 0:
            values = np.broadcast_to(values, indices.shape)
        if len(indices) != len(values):
            raise ValueError(
                f"`indices` and `values` lengths must match: {len(indices)}, {len(values)}"
            )
        if len(indices) and (indices.min() < 0 or indices.max() >= self._size):
            raise IndexOutOfBound(f"index out of bounds for size {self._size}")
        from ._build import build_coo_store

        vals_dev, ok_dev = build_coo_store(
            indices, None, values, (self._size,), self.dtype, dup_op
        )
        self._set_store(vals_dev, ok_dev)

    # ------------------------------------------------------------------ #
    # exports
    def to_coo(self, dtype=None, *, indices=True, values=True, sort=True):
        """Reference vector.py:482."""
        host_vals, host_ok = self._host_arrays()
        idx = np.nonzero(host_ok)[0]
        out_idx = idx.astype(np.uint64) if indices else None
        out_vals = None
        if values:
            out_vals = host_vals[idx]
            if dtype is not None:
                out_vals = out_vals.astype(lookup_dtype(dtype).np_type)
        return (out_idx, out_vals)

    def to_dense(self, fill_value=None, dtype=None, **opts):
        """Reference vector.py:948."""
        host_vals, host_ok = self._host_arrays()
        dt = self.dtype if dtype is None else lookup_dtype(dtype)
        out = host_vals.astype(dt.np_type, copy=True)
        if not host_ok.all():
            if fill_value is None:
                raise TypeError(
                    "fill_value must be given in to_dense when there are missing values"
                )
            out[~host_ok] = fill_value
        return out

    def to_dict(self):
        """Reference vector.py:1997."""
        idx, vals = self.to_coo()
        return {int(i): v for i, v in zip(idx.tolist(), vals.tolist())}

    # ------------------------------------------------------------------ #
    def resize(self, size):
        import jax.numpy as jnp

        size = int(size)
        cur = self._size
        if size == cur:
            return
        if size > cur:
            pad = size - cur
            vals = jnp.pad(self._vals, [(0, pad)] + [(0, 0)] * (self._vals.ndim - 1))
            valid = jnp.pad(self._valid, (0, pad))
        else:
            vals = self._vals[:size]
            valid = self._valid[:size]
        self._size = size
        self._set_store(vals, valid)

    def diag(self, k=0, *, name=None):
        """Build a diagonal Matrix from this vector.  Reference vector.py:620."""
        from . import execute
        from .matrix import Matrix

        k = int(k)
        n = self._size + abs(k)
        from .config import config

        if n * n > int(config.get("auto_sparse_limit", 1 << 22)):
            # graph-scale diagonal: sparse store, no O(n^2) bitmap
            from .engine import sparse as spx

            sp = spx.diag_sparse_store_k(self._vals, self._valid, self._size,
                                         k, n)
            return Matrix._from_sparse(self.dtype, sp, name=name)
        expr = BaseExpression("diag", None, [self], (self.dtype, k, n),
                              execute.T_diag_build, self.dtype, (n, n), Matrix)
        return expr.new(name=name)

    # ------------------------------------------------------------------ #
    # linear algebra
    def vxm(self, other, op="plus_times"):
        """v @ A (row vector times matrix).  Reference vector.py:1259."""
        from . import execute
        from .matrix import Matrix, TransposedMatrix

        bt = False
        b = other
        if isinstance(b, TransposedMatrix):
            bt, b = True, b._matrix
        b = self._expect_type(b, Matrix, within="vxm", argname="other")
        typed = get_typed_op(op, self.dtype, b.dtype, kind="semiring")
        _, oc = find_opclass(typed)
        if oc != "Semiring":
            raise TypeError(f"op for vxm must be a Semiring; got {oc}")
        bshape = b.shape if not bt else (b.shape[1], b.shape[0])
        if self._size != bshape[0]:
            raise DimensionMismatch(
                f"Dimensions not compatible for vxm: {self._size} vs {bshape}"
            )
        statics = ("vxm", self.dtype, b.dtype, False, bt)
        return BaseExpression("vxm", typed, [self, b], statics, execute.T_matmul,
                              typed.return_type, (bshape[1],), Vector)

    def inner(self, other, op="plus_times"):
        """Dot product -> Scalar.  Reference vector.py:1609."""
        from . import execute

        other = self._expect_type(other, Vector, within="inner", argname="other")
        typed = get_typed_op(op, self.dtype, other.dtype, kind="semiring")
        _, oc = find_opclass(typed)
        if oc != "Semiring":
            raise TypeError(f"op for inner must be a Semiring; got {oc}")
        if self._size != other._size:
            raise DimensionMismatch(
                f"Dimensions not compatible for inner: {self._size} vs {other._size}"
            )
        statics = ("inner", self.dtype, other.dtype, False, False)
        return BaseExpression("inner", typed, [self, other], statics,
                              execute.T_matmul, typed.return_type, (), Scalar)

    def outer(self, other, op="times"):
        """Outer product -> Matrix.  Reference vector.py:1653."""
        from . import execute
        from .matrix import Matrix

        other = self._expect_type(other, Vector, within="outer", argname="other")
        typed = get_typed_op(op, self.dtype, other.dtype, kind="binary")
        _, oc = find_opclass(typed)
        if oc == "Monoid":
            typed = typed.binaryop
        elif oc != "BinaryOp":
            raise TypeError(f"op for outer must be a BinaryOp; got {oc}")
        statics = (self.dtype, other.dtype)
        return BaseExpression("outer", typed, [self, other], statics,
                              execute.T_outer, typed.return_type,
                              (self._size, other._size), Matrix)

    def reduce(self, op="plus", *, allow_empty=True):
        """Reduce to Scalar.  Reference vector.py:1561."""
        from . import execute
        from .operator.agg import Aggregator, TypedAggregator

        op_obj, oc = find_opclass(op)
        if oc == "Aggregator":
            typed = op_obj[self.dtype] if isinstance(op_obj, Aggregator) else op_obj
            statics = (self.dtype, None, False)
            return BaseExpression("reduce_agg", typed, [self], statics,
                                  execute.T_reduce_agg, typed.return_type, (),
                                  Scalar)
        typed = get_typed_op(op, self.dtype, kind="monoid")
        _, oc = find_opclass(typed)
        if oc == "BinaryOp":
            parent = typed.parent if hasattr(typed, "parent") else typed
            mono = getattr(parent, "monoid", None)
            if mono is None:
                raise TypeError(
                    f"BinaryOp {parent.name} has no corresponding Monoid for reduce"
                )
            typed = mono[self.dtype]
        elif oc != "Monoid":
            raise TypeError(f"op for reduce must be a Monoid; got {oc}")
        if not allow_empty and self.dtype._is_udt:
            raise ValueError("allow_empty=False not supported for UDTs")
        statics = (self.dtype, bool(allow_empty))
        return BaseExpression("reduce", typed, [self], statics,
                              execute.T_reduce_scalar, typed.return_type, (),
                              Scalar)

    def reposition(self, offset, *, size=None):
        """Shift all indices by offset.  Reference vector.py:1695."""
        from . import execute

        out_size = self._size if size is None else int(size)
        statics = (self.dtype, (int(offset),), False)
        return BaseExpression("reposition", None, [self], statics,
                              execute.T_reposition, self.dtype, (out_size,), Vector)

    # ------------------------------------------------------------------ #
    # extract expression builder (called by AmbiguousAssignOrExtract)
    def _extract_expr(self, resolver, input_mask=None):
        from . import execute

        import jax.numpy as jnp

        (ix,) = resolver.indices
        if input_mask is not None:
            from .base import _check_mask

            input_mask = _check_mask(input_mask)
            if input_mask.parent.shape != self.shape:
                raise DimensionMismatch("input_mask shape must match the collection")
        if ix.is_scalar:
            idx = jnp.asarray(np.array(ix.index, np.int64))
            statics = (self.dtype, 1, False)
            expr = BaseExpression("extract_element", None, [self, idx], statics,
                                  execute.T_extract_element, self.dtype, (),
                                  Scalar)
            return expr
        idx = jnp.asarray(ix.index)
        statics = (self.dtype, "vec", False)
        expr = BaseExpression("extract", None, [self, idx], statics,
                              execute.T_extract, self.dtype, (ix.size,), Vector)
        if input_mask is not None:
            expr = execute.apply_input_mask(expr, self, input_mask, [ix])
        return expr

    def __iter__(self):
        host_vals, host_ok = self._host_arrays()
        return iter(np.nonzero(host_ok)[0].tolist())

    def _as_matrix(self, *, name=None):
        """Zero-copy cast to an (n, 1) column Matrix.  Reference vector.py:186."""
        from .matrix import Matrix

        return Matrix._from_store(self.dtype, self._vals[:, None],
                                  self._valid[:, None],
                                  name=name if name is not None else self._name)

    class _SSDescriptor:
        """Vector.ss: instance -> VectorSS(instance); class -> static surface."""

        def __get__(self, obj, objtype=None):
            from .ss.vector import VectorSS

            if obj is None:
                return VectorSS
            if obj._ss is None:
                obj._ss = VectorSS(obj)
            return obj._ss

    ss = _SSDescriptor()

    def __reduce__(self):
        idx, vals = self.to_coo()
        return (Vector._deserialize, (self.dtype if self.dtype._is_udt else self.dtype.name,
                                      self._size, idx, vals, self._name))

    @staticmethod
    def _deserialize(dtype, size, idx, vals, name):
        v = Vector(dtype, size, name=name)
        if len(idx):
            v.build(idx.astype(np.int64), vals)
        return v


_output_types[Vector] = Vector


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from .utils import x64_methods as _x64_methods  # noqa: E402
Vector = _x64_methods(Vector)
