"""Matrix and TransposedMatrix (reference core/matrix.py:157, :3614).

Storage: bitmap store on device — values (nrows, ncols), valid bool same
shape.  Full constructor/export surface parity with reference rows 4 of
SURVEY §2 (from_coo:885, from_edgelist:963, from_csr:1136, from_csc:1183,
from_dcsr:1230, from_dcsc:1314, from_scalar:1398, from_dense:1458,
from_dicts:1577; to_* families; mxm:2206, mxv:2163, kronecker:2253,
reduce_rowwise:2553, reduce_columnwise:2590, reduce_scalar:2627,
reposition:2679, power:2754).
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
from .mask import StructuralMask, ValueMask
from .operator.base import find_opclass
from .operator.utils import get_typed_op
from .scalar import Scalar, _as_scalar, _is_scalar_like
from .utils import _output_types, ints_to_numpy_buffer, output_type, values_to_numpy_buffer
from .vector import Vector

__all__ = ["Matrix", "TransposedMatrix"]


class Matrix(Collection):
    __slots__ = ("_nrows", "_ncols", "_ss")
    ndim = 2

    def __init__(self, dtype=None, nrows=0, ncols=0, *, name=None):
        super().__init__()
        import jax.numpy as jnp

        from .engine import store as st

        if dtype is None:
            dtype = lookup_dtype("FP64")
        self.dtype = lookup_dtype(dtype)
        nrows, ncols = int(nrows), int(ncols)
        if nrows < 0 or ncols < 0:
            raise ValueError("nrows and ncols must be non-negative")
        self._nrows = nrows
        self._ncols = ncols
        self._name = name
        self._ss = None
        from .config import config

        if nrows * ncols > int(config.get("auto_sparse_limit", 1 << 22)):
            # graph-scale: back with an empty padded-CSR store instead of an
            # O(nrows*ncols) bitmap allocation (engine/sparse.py)
            from .engine import sparse as spx

            self._set_sparse_store(
                spx.build_sparse_store(np.empty(0, np.int64),
                                       np.empty(0, np.int64),
                                       np.empty(0, self.dtype.np_type),
                                       nrows, ncols, self.dtype))
        else:
            self._set_store(st.zeros_values((nrows, ncols), self.dtype),
                            jnp.zeros((nrows, ncols), bool))

    # ------------------------------------------------------------------ #
    @classmethod
    def _empty(cls, dtype, shape, name=None):
        return cls(dtype, shape[0], shape[1], name=name)

    @classmethod
    def _from_sparse(cls, dtype, sp, name=None):
        m = cls.__new__(cls)
        BaseType.__init__(m)
        m.dtype = lookup_dtype(dtype)
        m._nrows = sp.nrows
        m._ncols = sp.ncols
        m._name = name
        m._ss = None
        m._set_sparse_store(sp)
        return m

    @classmethod
    def _from_store(cls, dtype, vals, valid, name=None):
        m = cls.__new__(cls)
        BaseType.__init__(m)
        m.dtype = lookup_dtype(dtype)
        m._nrows = int(valid.shape[0])
        m._ncols = int(valid.shape[1])
        m._name = name
        m._ss = None
        m._set_store(vals, valid)
        return m

    def _new_like(self, dtype, name=None):
        return Matrix(dtype, self._nrows, self._ncols, name=name)

    @property
    def nrows(self):
        return self._nrows

    @property
    def ncols(self):
        return self._ncols

    @property
    def shape(self):
        return (self._nrows, self._ncols)

    @property
    def T(self):
        return TransposedMatrix(self)

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

        return formatting.format_matrix(self)

    def _repr_html_(self, mask=None):
        from . import formatting

        return formatting.format_matrix_html(self, mask=mask)

    # ------------------------------------------------------------------ #
    # constructors
    @classmethod
    def from_coo(cls, rows, columns, values=1.0, dtype=None, *, nrows=None,
                 ncols=None, dup_op=None, name=None):
        """Reference matrix.py:885."""
        rows = ints_to_numpy_buffer(rows, np.int64, name="row indices")
        columns = ints_to_numpy_buffer(columns, np.int64, name="column indices")
        values, dtype = values_to_numpy_buffer(values, dtype)
        if values.ndim == 0:
            values = np.broadcast_to(values, rows.shape)
        if len(rows) != len(columns):
            raise ValueError(
                f"`rows` and `columns` lengths must match: {len(rows)}, {len(columns)}"
            )
        if len(values) != len(rows) and values.ndim >= 1:
            raise ValueError(
                f"`rows` and `values` lengths must match: {len(rows)}, {len(values)}"
            )
        if nrows is None:
            if len(rows) == 0:
                raise ValueError("No row indices provided. Unable to infer nrows.")
            nrows = int(rows.max()) + 1
        if ncols is None:
            if len(columns) == 0:
                raise ValueError("No column indices provided. Unable to infer ncols.")
            ncols = int(columns.max()) + 1
        m = cls(dtype, nrows, ncols, name=name)
        if len(rows):
            m.build(rows, columns, values, dup_op=dup_op)
        return m

    @classmethod
    def from_edgelist(cls, edgelist, values=None, dtype=None, *, nrows=None,
                      ncols=None, dup_op=None, name=None):
        """Reference matrix.py:963."""
        edges = np.asarray(list(edgelist) if not isinstance(edgelist, np.ndarray)
                           else edgelist)
        if edges.ndim != 2 or edges.shape[1] not in (2, 3):
            raise ValueError(
                "edgelist must be an iterable of (row, col) or (row, col, value)"
            )
        if edges.shape[1] == 3:
            if values is not None:
                raise TypeError(
                    "Too many sources of values: edgelist values and `values=`"
                )
            rows = edges[:, 0].astype(np.int64)
            cols = edges[:, 1].astype(np.int64)
            vals = edges[:, 2]
        else:
            rows = edges[:, 0].astype(np.int64)
            cols = edges[:, 1].astype(np.int64)
            vals = 1.0 if values is None else values
        return cls.from_coo(rows, cols, vals, dtype, nrows=nrows, ncols=ncols,
                            dup_op=dup_op, name=name)

    @classmethod
    def from_csr(cls, indptr, col_indices, values=1.0, dtype=None, *,
                 nrows=None, ncols=None, name=None):
        """Reference matrix.py:1136."""
        indptr = ints_to_numpy_buffer(indptr, np.int64, name="indptr")
        col_indices = ints_to_numpy_buffer(col_indices, np.int64, name="col_indices")
        if nrows is None:
            nrows = len(indptr) - 1
        rows = np.repeat(np.arange(nrows, dtype=np.int64), np.diff(indptr))
        if ncols is None:
            ncols = int(col_indices.max()) + 1 if len(col_indices) else 0
        return cls.from_coo(rows, col_indices, values, dtype, nrows=nrows,
                            ncols=ncols, name=name)

    @classmethod
    def from_csc(cls, indptr, row_indices, values=1.0, dtype=None, *,
                 nrows=None, ncols=None, name=None):
        """Reference matrix.py:1183."""
        indptr = ints_to_numpy_buffer(indptr, np.int64, name="indptr")
        row_indices = ints_to_numpy_buffer(row_indices, np.int64, name="row_indices")
        if ncols is None:
            ncols = len(indptr) - 1
        cols = np.repeat(np.arange(ncols, dtype=np.int64), np.diff(indptr))
        if nrows is None:
            nrows = int(row_indices.max()) + 1 if len(row_indices) else 0
        return cls.from_coo(row_indices, cols, values, dtype, nrows=nrows,
                            ncols=ncols, name=name)

    @classmethod
    def from_dcsr(cls, compressed_rows, indptr, col_indices, values=1.0,
                  dtype=None, *, nrows=None, ncols=None, name=None):
        """Doubly-compressed CSR (hypercsr).  Reference matrix.py:1230."""
        compressed_rows = ints_to_numpy_buffer(compressed_rows, np.int64,
                                               name="compressed_rows")
        indptr = ints_to_numpy_buffer(indptr, np.int64, name="indptr")
        col_indices = ints_to_numpy_buffer(col_indices, np.int64, name="col_indices")
        rows = np.repeat(compressed_rows, np.diff(indptr))
        if nrows is None:
            nrows = int(compressed_rows.max()) + 1 if len(compressed_rows) else 0
        if ncols is None:
            ncols = int(col_indices.max()) + 1 if len(col_indices) else 0
        return cls.from_coo(rows, col_indices, values, dtype, nrows=nrows,
                            ncols=ncols, name=name)

    @classmethod
    def from_dcsc(cls, compressed_cols, indptr, row_indices, values=1.0,
                  dtype=None, *, nrows=None, ncols=None, name=None):
        """Reference matrix.py:1314."""
        compressed_cols = ints_to_numpy_buffer(compressed_cols, np.int64,
                                               name="compressed_cols")
        indptr = ints_to_numpy_buffer(indptr, np.int64, name="indptr")
        row_indices = ints_to_numpy_buffer(row_indices, np.int64, name="row_indices")
        cols = np.repeat(compressed_cols, np.diff(indptr))
        if ncols is None:
            ncols = int(compressed_cols.max()) + 1 if len(compressed_cols) else 0
        if nrows is None:
            nrows = int(row_indices.max()) + 1 if len(row_indices) else 0
        return cls.from_coo(row_indices, cols, values, dtype, nrows=nrows,
                            ncols=ncols, name=name)

    @classmethod
    def from_scalar(cls, value, nrows, ncols, dtype=None, *, name=None):
        """Dense iso matrix.  Reference matrix.py:1398."""
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
                raise EmptyObject("Scalar is empty; cannot create Matrix from it")
            value = value.value
        m = cls(dtype, nrows, ncols, name=name)
        m._set_store(st.full_values((nrows, ncols), dtype, value),
                     jnp.ones((nrows, ncols), bool))
        return m

    @classmethod
    def from_dense(cls, values, missing_value=None, dtype=None, *, name=None):
        """Reference matrix.py:1458."""
        import jax.numpy as jnp

        from .engine import store as st

        values, dtype = values_to_numpy_buffer(values, dtype)
        if values.ndim < 2 and not dtype._is_udt:
            raise TypeError("values must be 2-dimensional for Matrix.from_dense")
        nrows, ncols = values.shape[:2]
        m = cls(dtype, nrows, ncols, name=name)
        dev = st.np_values_to_device(values, dtype)
        if missing_value is None:
            valid = jnp.ones((nrows, ncols), bool)
        else:
            valid = jnp.asarray(values != missing_value)
        m._set_store(dev, valid)
        return m

    @classmethod
    def from_dicts(cls, nested_dicts, dtype=None, *, order="rowwise", nrows=None,
                   ncols=None, name=None):
        """{row: {col: val}} (or list of dicts).  Reference matrix.py:1577."""
        from .utils import get_order

        order = get_order(order)
        rows, cols, vals = [], [], []
        if isinstance(nested_dicts, dict):
            items = nested_dicts.items()
        else:
            items = enumerate(nested_dicts)
        for outer, inner in items:
            for inner_k, v in inner.items():
                rows.append(outer)
                cols.append(inner_k)
                vals.append(v)
        if order == "columnwise":
            rows, cols = cols, rows
        if not rows and (nrows is None or ncols is None):
            raise ValueError("Unable to infer nrows/ncols from empty dicts")
        return cls.from_coo(
            np.array(rows, np.int64), np.array(cols, np.int64),
            vals if vals else np.array([], np.float64),
            dtype, nrows=nrows, ncols=ncols, name=name,
        )

    def build(self, rows, columns, values, *, dup_op=None, clear=False,
              nrows=None, ncols=None):
        """Reference matrix.py:643."""
        import jax.numpy as jnp

        from .engine import store as st

        if nrows is not None or ncols is not None:
            raise TypeError("nrows/ncols keyword args not supported (resize first)")
        if not clear and self.nvals > 0:
            raise OutputNotEmpty("Matrix already contains values; use clear=True")
        rows = ints_to_numpy_buffer(rows, np.int64, name="row indices")
        columns = ints_to_numpy_buffer(columns, np.int64, name="column indices")
        values, vdtype = values_to_numpy_buffer(values, self.dtype)
        if values.ndim == 0:
            values = np.broadcast_to(values, rows.shape)
        if not (len(rows) == len(columns) == len(values)):
            raise ValueError(
                f"The lengths of `rows`, `columns`, and `values` must match: "
                f"{len(rows)}, {len(columns)}, {len(values)}"
            )
        if len(rows):
            if rows.min() < 0 or rows.max() >= self._nrows:
                raise IndexOutOfBound(
                    f"row index out of bounds for nrows {self._nrows}"
                )
            if columns.min() < 0 or columns.max() >= self._ncols:
                raise IndexOutOfBound(
                    f"column index out of bounds for ncols {self._ncols}"
                )
        from ._build import build_coo_store, build_sparse_coo_store

        if self._sparse is not None:
            self._set_sparse_store(build_sparse_coo_store(
                rows, columns, values, (self._nrows, self._ncols), self.dtype,
                dup_op))
            return
        vals_dev, ok_dev = build_coo_store(
            rows, columns, values, (self._nrows, self._ncols), self.dtype, dup_op
        )
        self._set_store(vals_dev, ok_dev)

    # ------------------------------------------------------------------ #
    # exports
    def to_coo(self, dtype=None, *, rows=True, columns=True, values=True,
               sort=True):
        """Reference matrix.py:543."""
        if self._sparse is not None:
            r, c, v = self._sparse.host_coo()
            out_v = None
            if values:
                if isinstance(v, dict):
                    # struct UDT: assemble field dict into a structured array
                    n = len(r)
                    out_v = np.empty(n, self.dtype.np_type)
                    for name, field in v.items():
                        out_v[name] = field
                else:
                    out_v = v
                if dtype is not None:
                    out_v = out_v.astype(lookup_dtype(dtype).np_type)
            return (r.astype(np.uint64) if rows else None,
                    c.astype(np.uint64) if columns else None, out_v)
        host_vals, host_ok = self._host_arrays()
        r, c = np.nonzero(host_ok)
        out_r = r.astype(np.uint64) if rows else None
        out_c = c.astype(np.uint64) if columns else None
        out_v = None
        if values:
            out_v = host_vals[r, c]
            if dtype is not None:
                out_v = out_v.astype(lookup_dtype(dtype).np_type)
        return (out_r, out_c, out_v)

    def to_edgelist(self, dtype=None, *, values=True, sort=True):
        """Reference matrix.py:613."""
        r, c, v = self.to_coo(dtype, sort=sort)
        edges = np.column_stack([r, c])
        if values:
            return (edges, v)
        return (edges, None)

    def to_csr(self, dtype=None, *, sort=True):
        """Reference matrix.py:1704."""
        r, c, v = self.to_coo(dtype)
        indptr = np.zeros(self._nrows + 1, np.uint64)
        np.add.at(indptr, r.astype(np.int64) + 1, 1)
        indptr = np.cumsum(indptr).astype(np.uint64)
        return indptr, c, v

    def to_csc(self, dtype=None, *, sort=True):
        """Reference matrix.py:1735."""
        host_vals, host_ok = self._host_arrays()
        c, r = np.nonzero(host_ok.T)
        v = host_vals.T[c, r]
        if dtype is not None:
            v = v.astype(lookup_dtype(dtype).np_type)
        indptr = np.zeros(self._ncols + 1, np.uint64)
        np.add.at(indptr, c.astype(np.int64) + 1, 1)
        indptr = np.cumsum(indptr).astype(np.uint64)
        return indptr, r.astype(np.uint64), v

    def to_dcsr(self, dtype=None, *, sort=True):
        """Reference matrix.py:1766."""
        indptr, c, v = self.to_csr(dtype)
        counts = np.diff(indptr.astype(np.int64))
        nonempty = np.nonzero(counts > 0)[0]
        new_indptr = np.concatenate([[0], np.cumsum(counts[nonempty])]).astype(np.uint64)
        return nonempty.astype(np.uint64), new_indptr, c, v

    def to_dcsc(self, dtype=None, *, sort=True):
        """Reference matrix.py:1808."""
        indptr, r, v = self.to_csc(dtype)
        counts = np.diff(indptr.astype(np.int64))
        nonempty = np.nonzero(counts > 0)[0]
        new_indptr = np.concatenate([[0], np.cumsum(counts[nonempty])]).astype(np.uint64)
        return nonempty.astype(np.uint64), new_indptr, r, v

    def to_dense(self, fill_value=None, dtype=None, **opts):
        """Reference matrix.py:1520."""
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

    def to_dicts(self, order="rowwise"):
        """Reference matrix.py:1854."""
        from .utils import get_order

        order = get_order(order)
        r, c, v = self.to_coo()
        out = {}
        if order == "columnwise":
            r, c = c, r
        for i, j, val in zip(r.tolist(), c.tolist(), v.tolist()):
            out.setdefault(int(i), {})[int(j)] = val
        return out

    # ------------------------------------------------------------------ #
    def resize(self, nrows, ncols):
        """Reference matrix.py:494."""
        import jax.numpy as jnp

        nrows, ncols = int(nrows), int(ncols)
        vals, valid = self._vals, self._valid
        if nrows > self._nrows:
            vals = jnp.pad(vals, [(0, nrows - self._nrows)] + [(0, 0)] * (vals.ndim - 1))
            valid = jnp.pad(valid, [(0, nrows - self._nrows), (0, 0)])
        elif nrows < self._nrows:
            vals = vals[:nrows]
            valid = valid[:nrows]
        if ncols > self._ncols:
            vals = jnp.pad(vals, [(0, 0), (0, ncols - self._ncols)] + [(0, 0)] * (vals.ndim - 2))
            valid = jnp.pad(valid, [(0, 0), (0, ncols - self._ncols)])
        elif ncols < self._ncols:
            vals = vals[:, :ncols]
            valid = valid[:, :ncols]
        self._nrows, self._ncols = nrows, ncols
        self._set_store(vals, valid)

    def diag(self, k=0, *, name=None):
        """Extract diagonal k as a Vector.  Reference matrix.py:735."""
        from . import execute

        k = int(k)
        if k >= 0:
            size = max(0, min(self._nrows, self._ncols - k))
        else:
            size = max(0, min(self._nrows + k, self._ncols))
        expr = BaseExpression("diag", None, [self], (self.dtype, k, False),
                              execute.T_diag_extract, self.dtype, (size,), Vector)
        return expr.new(name=name)

    # ------------------------------------------------------------------ #
    # linear algebra
    def _matmul_expr(self, kind, other, op, within):
        from . import execute

        at = bt = False
        a, b = self, other
        if isinstance(a, TransposedMatrix):
            at, a = True, a._matrix
        if isinstance(b, TransposedMatrix):
            bt, b = True, b._matrix
        typed = get_typed_op(op, a.dtype, b.dtype, kind="semiring")
        _, oc = find_opclass(typed)
        if oc != "Semiring":
            raise TypeError(f"op for {within} must be a Semiring; got {oc}")
        sa = a.shape if not at else (a.shape[1], a.shape[0])
        if kind == "mxv":
            b = self._expect_type(b, Vector, within=within, argname="other")
            if sa[1] != b.size:
                raise DimensionMismatch(
                    f"Dimensions not compatible for mxv: {sa} x {b.size}"
                )
            statics = ("mxv", a.dtype, b.dtype, at, False)
            return BaseExpression("mxv", typed, [a, b], statics, execute.T_matmul,
                                  typed.return_type, (sa[0],), Vector)
        sb = b.shape if not bt else (b.shape[1], b.shape[0])
        if sa[1] != sb[0]:
            raise DimensionMismatch(
                f"Dimensions not compatible for mxm: {sa} x {sb}"
            )
        statics = ("mxm", a.dtype, b.dtype, at, bt)
        return BaseExpression("mxm", typed, [a, b], statics, execute.T_matmul,
                              typed.return_type, (sa[0], sb[1]), Matrix)

    def mxv(self, other, op="plus_times"):
        """Matrix-vector multiply.  Reference matrix.py:2163."""
        other2 = other
        if not isinstance(other2, Vector):
            other2 = self._expect_type(other2, Vector, within="mxv", argname="other")
        return self._matmul_expr("mxv", other2, op, "mxv")

    def mxm(self, other, op="plus_times"):
        """Matrix-matrix multiply.  Reference matrix.py:2206."""
        if not isinstance(other, (Matrix, TransposedMatrix)):
            other = self._expect_type(other, (Matrix, TransposedMatrix),
                                      within="mxm", argname="other")
        return self._matmul_expr("mxm", other, op, "mxm")

    def kronecker(self, other, op="times"):
        """Kronecker product.  Reference matrix.py:2253."""
        from . import execute

        at = bt = False
        a, b = self, other
        if isinstance(a, TransposedMatrix):
            at, a = True, a._matrix
        if isinstance(b, TransposedMatrix):
            bt, b = True, b._matrix
        b = self._expect_type(b, (Matrix, TransposedMatrix), within="kronecker",
                              argname="other")
        typed = get_typed_op(op, a.dtype, b.dtype, kind="binary")
        _, oc = find_opclass(typed)
        if oc == "Monoid":
            typed = typed.binaryop
        elif oc != "BinaryOp":
            raise TypeError(f"op for kronecker must be a BinaryOp; got {oc}")
        sa = a.shape if not at else (a.shape[1], a.shape[0])
        sb = b.shape if not bt else (b.shape[1], b.shape[0])
        statics = (a.dtype, b.dtype, at, bt)
        return BaseExpression("kronecker", typed, [a, b], statics, execute.T_kron,
                              typed.return_type, (sa[0] * sb[0], sa[1] * sb[1]),
                              Matrix)

    def _reduce_axis_expr(self, op, axis, method):
        from . import execute
        from .operator.agg import Aggregator, TypedAggregator

        size = self._nrows if axis == 1 else self._ncols
        op_obj, oc = find_opclass(op)
        if oc == "Aggregator":
            typed = op_obj[self.dtype] if isinstance(op_obj, Aggregator) else op_obj
            statics = (self.dtype, axis, False)
            return BaseExpression("reduce_agg", typed, [self], statics,
                                  execute.T_reduce_agg, typed.return_type,
                                  (size,), Vector)
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
            raise TypeError(f"op for {method} must be a Monoid; got {oc}")
        statics = (self.dtype, axis, False)
        return BaseExpression(method, typed, [self], statics,
                              execute.T_reduce_axis, typed.return_type, (size,),
                              Vector)

    def reduce_rowwise(self, op="plus"):
        """Reference matrix.py:2553."""
        return self._reduce_axis_expr(op, 1, "reduce_rowwise")

    def reduce_columnwise(self, op="plus"):
        """Reference matrix.py:2590."""
        return self._reduce_axis_expr(op, 0, "reduce_columnwise")

    def reduce_scalar(self, op="plus", *, allow_empty=True):
        """Reference matrix.py:2627."""
        from . import execute
        from .operator.agg import Aggregator, TypedAggregator

        op_obj, oc = find_opclass(op)
        if oc == "Aggregator":
            typed = op_obj[self.dtype] if isinstance(op_obj, Aggregator) else op_obj
            parent_agg = typed.parent if isinstance(typed, TypedAggregator) else op_obj
            name = getattr(parent_agg, "name", None)
            if name in ("argmin", "argmax", "first_index", "last_index"):
                # reference error contract (tests/test_matrix.py:1484-1487)
                raise ValueError(
                    f"Aggregator {name} may not be used with "
                    "Matrix.reduce_scalar")
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
            raise TypeError(f"op for reduce_scalar must be a Monoid; got {oc}")
        statics = (self.dtype, bool(allow_empty))
        return BaseExpression("reduce_scalar", typed, [self], statics,
                              execute.T_reduce_scalar, typed.return_type, (),
                              Scalar)

    def reposition(self, row_offset, column_offset, *, nrows=None, ncols=None):
        """Reference matrix.py:2679."""
        from . import execute

        out_nrows = self._nrows if nrows is None else int(nrows)
        out_ncols = self._ncols if ncols is None else int(ncols)
        statics = (self.dtype, (int(row_offset), int(column_offset)), False)
        return BaseExpression("reposition", None, [self], statics,
                              execute.T_reposition, self.dtype,
                              (out_nrows, out_ncols), Matrix)

    def power(self, n, op="plus_times"):
        """Matrix power by repeated squaring (reference matrix.py:2754, recipe
        at :95-155)."""
        from . import execute

        if not isinstance(n, (int, np.integer)) or isinstance(n, bool):
            # reference error contract: 1.5 is a TypeError, -1 a ValueError
            raise TypeError(f"n must be a positive integer; got {type(n)}")
        n = int(n)
        if n < 1:
            raise ValueError(f"n must be a positive integer; got {n}")
        if self._nrows != self._ncols:
            raise DimensionMismatch("power requires a square Matrix")
        typed = get_typed_op(op, self.dtype, self.dtype, kind="semiring")
        _, oc = find_opclass(typed)
        if oc != "Semiring":
            raise TypeError(f"op for power must be a Semiring; got {oc}")
        statics = (self.dtype, n)
        return BaseExpression("power", typed, [self], statics, execute.T_power,
                              typed.return_type, self.shape, Matrix)

    # ------------------------------------------------------------------ #
    # extract expression builder
    def _extract_expr(self, resolver, input_mask=None):
        from . import execute

        import jax.numpy as jnp

        rix, cix = resolver.indices
        if rix.is_scalar and cix.is_scalar:
            i = jnp.asarray(np.array(rix.index, np.int64))
            j = jnp.asarray(np.array(cix.index, np.int64))
            statics = (self.dtype, 2, False)
            expr = BaseExpression("extract_element", None, [self, i, j], statics,
                                  execute.T_extract_element, self.dtype, (),
                                  Scalar)
        elif rix.is_scalar:
            i = jnp.asarray(np.array([rix.index], np.int64))
            cols = jnp.asarray(cix.index)
            statics = (self.dtype, "row", False)
            expr = BaseExpression("extract", None, [self, i, cols], statics,
                                  execute.T_extract, self.dtype, (cix.size,),
                                  Vector)
        elif cix.is_scalar:
            rows = jnp.asarray(rix.index)
            j = jnp.asarray(np.array([cix.index], np.int64))
            statics = (self.dtype, "col", False)
            expr = BaseExpression("extract", None, [self, rows, j], statics,
                                  execute.T_extract, self.dtype, (rix.size,),
                                  Vector)
        else:
            rows_np = np.asarray(rix.index)
            cols_np = np.asarray(cix.index)
            # duplicate-free index lists unlock the O(nnz) sparse extract
            unique = (len(np.unique(rows_np)) == len(rows_np)
                      and len(np.unique(cols_np)) == len(cols_np))
            rows = jnp.asarray(rix.index)
            cols = jnp.asarray(cix.index)
            statics = (self.dtype, "mat", False, unique)
            expr = BaseExpression("extract", None, [self, rows, cols], statics,
                                  execute.T_extract, self.dtype,
                                  (rix.size, cix.size), Matrix)
        if input_mask is not None:
            expr = execute.apply_input_mask(expr, self, input_mask,
                                            resolver.indices)
        return expr

    def __iter__(self):
        host_vals, host_ok = self._host_arrays()
        r, c = np.nonzero(host_ok)
        return iter(zip(r.tolist(), c.tolist()))

    def _as_vector(self, *, name=None):
        """Cast an (n, 1) Matrix to a Vector.  Reference matrix.py:215."""
        if self._ncols != 1:
            raise ValueError(
                f"Matrix must have a single column (not {self._ncols}) to be cast "
                "to a Vector"
            )
        return Vector._from_store(self.dtype, self._vals[:, 0], self._valid[:, 0],
                                  name=name if name is not None else self._name)

    class _SSDescriptor:
        """Matrix.ss: instance -> MatrixSS(instance); class -> static surface
        (import_any, deserialize, ...), matching the reference."""

        def __get__(self, obj, objtype=None):
            from .ss.matrix import MatrixSS

            if obj is None:
                return MatrixSS
            if obj._ss is None:
                obj._ss = MatrixSS(obj)
            return obj._ss

    ss = _SSDescriptor()

    def __reduce__(self):
        r, c, v = self.to_coo()
        return (Matrix._deserialize,
                (self.dtype if self.dtype._is_udt else self.dtype.name,
                 self._nrows, self._ncols, r, c, v, self._name))

    @staticmethod
    def _deserialize(dtype, nrows, ncols, r, c, v, name):
        m = Matrix(dtype, nrows, ncols, name=name)
        if len(r):
            m.build(r.astype(np.int64), c.astype(np.int64), v)
        return m


class TransposedMatrix:
    """Lazy transpose view (reference core/matrix.py:3614)."""

    __slots__ = "_matrix", "__weakref__"
    ndim = 2
    _is_scalar = False
    _is_transposed = True

    def __init__(self, matrix):
        self._matrix = matrix

    @property
    def dtype(self):
        return self._matrix.dtype

    @property
    def nrows(self):
        return self._matrix._ncols

    @property
    def ncols(self):
        return self._matrix._nrows

    @property
    def shape(self):
        return (self._matrix._ncols, self._matrix._nrows)

    @property
    def nvals(self):
        return self._matrix.nvals

    @property
    def T(self):
        return self._matrix

    @property
    def name(self):
        base = self._matrix.name or "M"
        return f"{base}.T"

    _name_html = name

    def __repr__(self):
        from .formatting import format_transposed

        return format_transposed(self)

    def _repr_html_(self):
        from .formatting import format_transposed

        return f"<pre>{format_transposed(self)}</pre>"

    def new(self, dtype=None, *, mask=None, name=None, **opts):
        from . import execute

        out_dt = self._matrix.dtype if dtype is None else lookup_dtype(dtype)
        expr = BaseExpression("transpose", None, [self._matrix],
                              (self._matrix.dtype,), execute.T_transpose,
                              out_dt, self.shape, Matrix)
        return expr.new(dtype, mask=mask, name=name)

    dup = new

    # delegate operations (they detect the transposed wrapper)
    def ewise_add(self, other, op="plus"):
        return Collection._ewise_expr(self, other, op, "add", within="ewise_add")

    def ewise_mult(self, other, op="times"):
        return Collection._ewise_expr(self, other, op, "mult", within="ewise_mult")

    def ewise_union(self, other, op, left_default, right_default):
        return Collection._ewise_expr(self, other, op, "union", ldef=left_default,
                                      rdef=right_default, within="ewise_union")

    mxv = Matrix.mxv
    mxm = Matrix.mxm
    kronecker = Matrix.kronecker
    apply = Collection.apply
    _apply_indexunary = Collection._apply_indexunary
    select = Collection.select
    _expect_type = Matrix._expect_type
    _expect_op = Matrix._expect_op
    _matmul_expr = Matrix._matmul_expr
    _reduce_axis_expr = Matrix._reduce_axis_expr

    def reduce_rowwise(self, op="plus"):
        expr = self._matrix._reduce_axis_expr(op, 0, "reduce_rowwise")
        return expr

    def reduce_columnwise(self, op="plus"):
        expr = self._matrix._reduce_axis_expr(op, 1, "reduce_columnwise")
        return expr

    def reduce_scalar(self, op="plus", *, allow_empty=True):
        return self._matrix.reduce_scalar(op, allow_empty=allow_empty)

    def power(self, n, op="plus_times"):
        """A.T raised to the n-th semiring power (reference matrix.py:2754
        supports the transposed view); materializes the transpose first."""
        return self.new().power(n, op)

    def reposition(self, row_offset, column_offset, *, nrows=None,
                   ncols=None):
        """Reposition the transposed view (reference matrix.py:2679)."""
        return self.new().reposition(row_offset, column_offset, nrows=nrows,
                                     ncols=ncols)

    def to_coo(self, dtype=None, *, rows=True, columns=True, values=True,
               sort=True):
        c, r, v = self._matrix.to_coo(dtype, sort=sort)
        order = np.lexsort((r, c)) if sort else slice(None)
        return (c[order] if rows else None, r[order] if columns else None,
                v[order] if values else None)

    def to_dense(self, fill_value=None, dtype=None, **opts):
        return self._matrix.to_dense(fill_value, dtype).T.copy()

    def __getitem__(self, keys):
        from .expr import AmbiguousAssignOrExtract, IndexerResolver

        # extract via a materialized transpose expression target
        mat = self.new()
        return AmbiguousAssignOrExtract(mat, IndexerResolver(mat, keys))

    def isequal(self, other, *, check_dtype=False):
        return self.new().isequal(other, check_dtype=check_dtype)

    def isclose(self, other, *, rel_tol=1e-7, abs_tol=0.0, check_dtype=False):
        return self.new().isclose(other, rel_tol=rel_tol, abs_tol=abs_tol,
                                  check_dtype=check_dtype)

    @property
    def S(self):
        return StructuralMask(self.new())

    @property
    def V(self):
        return ValueMask(self.new())


_output_types[Matrix] = Matrix
_output_types[TransposedMatrix] = TransposedMatrix


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from .utils import x64_methods as _x64_methods  # noqa: E402
Matrix = _x64_methods(Matrix)
TransposedMatrix = _x64_methods(TransposedMatrix)
