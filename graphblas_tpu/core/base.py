"""BaseType / BaseExpression: the delayed-expression protocol.

Parity target: reference core/base.py (BaseType:186, BaseExpression:515,
__call__:192-263, _update:318-494, call funnel :23-54).  The right-hand side
of ``C(mask, accum, replace) << expr`` builds a delayed expression carrying
everything needed; `_update` is the single choke point where mask, accumulator,
replace, transposes, and the semiring meet — here they are fused into ONE
jit-compiled TPU kernel per static configuration (see core/execute.py), the
TPU analog of the reference's single C call.
"""

import numpy as np

from ..exceptions import DimensionMismatch, DomainMismatch
from .dtypes import lookup_dtype, unify
from .mask import Mask
from .operator.base import OpBase, ParameterizedUdf, TypedOpBase, find_opclass
from .utils import output_type

_recorder_imported = False


def record_call(line):
    from .recorder import record

    record(line)


def _expect_type(self, x, types, *, within=None, argname=None, extra_message=""):
    if isinstance(x, types):
        return x
    # autocompute: an expression whose output type matches is materialized
    # on demand, so expressions compose as operands (reference
    # automethods trampoline, core/automethods.py:13)
    out_t = getattr(x, "output_type", None)
    if out_t is not None and (isinstance(x, BaseExpression)
                              or hasattr(x, "_get_value")
                              or hasattr(x, "new")):
        tt = types if isinstance(types, tuple) else (types,)
        if any(isinstance(out_t, type) and issubclass(out_t, t) for t in tt):
            from .config import config

            if config.get("autocompute", True) and hasattr(x, "new"):
                return x.new()
    if isinstance(types, tuple):
        names = ", ".join(t.__name__ for t in types)
    else:
        names = types.__name__
    where = f" (in {within!r})" if within else ""
    arg = f" for argument {argname!r}" if argname else ""
    raise TypeError(f"Bad type{arg}{where}: expected {names}, got {type(x).__name__}."
                    + (f"  {extra_message}" if extra_message else ""))


def _expect_op(self, op, opclasses, *, within=None, argname=None):
    op, opclass = find_opclass(op)
    if isinstance(opclasses, str):
        opclasses = (opclasses,)
    if opclass not in opclasses:
        raise TypeError(
            f"Bad operator type for {within or 'operation'}: expected "
            f"{' or '.join(opclasses)}, got {opclass} ({op!r})"
        )
    return op


def _check_mask(mask, output=None):
    if not isinstance(mask, Mask):
        if isinstance(mask, BaseType):
            raise TypeError(
                "Mask must indicate values (M.V) or structure (M.S); "
                "got a bare collection.  Use `M.S` or `M.V`."
            )
        raise TypeError(f"Invalid mask: {type(mask)}")
    # a vector mask on a matrix target is legal for row/col assign
    # (GrB_Row_assign / GrB_Col_assign take a vector mask); rank mismatch is
    # validated at the use site, same-rank shape mismatch is an error now
    if (output is not None and mask.parent.ndim == output.ndim
            and output.shape != mask.parent.shape):
        raise DimensionMismatch(
            f"mask shape {mask.parent.shape} does not match output shape {output.shape}"
        )
    return mask


class BaseType:
    __slots__ = ("_d_vals", "_d_valid", "_sparse", "_dist", "dtype", "_name",
                 "_nvals_cache", "__weakref__")
    _is_scalar = False

    _expect_type = _expect_type
    _expect_op = _expect_op

    def __init__(self):
        self._nvals_cache = None
        self._sparse = None
        self._dist = None

    # ------------------------------------------------------------------ #
    @property
    def name(self):
        return self._name

    @name.setter
    def name(self, value):
        self._name = value

    @property
    def _name_html(self):
        return self.name or f"{type(self).__name__.upper()[0]}"

    def _set_store(self, vals, valid):
        self._d_vals = vals
        self._d_valid = valid
        self._sparse = None
        self._dist = None
        self._nvals_cache = None

    def _set_sparse_store(self, sp):
        """Adopt a padded-CSR SparseStore (engine/sparse.py) as the backing."""
        self._sparse = sp
        self._d_vals = None
        self._d_valid = None
        self._dist = None
        self._nvals_cache = None

    @property
    def _vals(self):
        if self._sparse is not None:
            self._densify()
        return self._d_vals

    @property
    def _valid(self):
        if self._sparse is not None:
            self._densify()
        return self._d_valid

    def _densify(self):
        """Convert the sparse backing to the bitmap store, guarded by the
        ``dense_limit`` config so an O(nrows*ncols) allocation on a
        graph-scale matrix raises instead of exhausting device memory."""
        sp = self._sparse
        from .config import config

        limit = int(config.get("dense_limit", 1 << 26))
        total = sp.nrows * max(sp.ncols, 1)
        if total > limit:
            from ..exceptions import OutOfMemory

            raise OutOfMemory(
                f"operation requires densifying a {sp.nrows}x{sp.ncols} sparse "
                f"{type(self).__name__} ({total} > dense_limit={limit}).  "
                "This operation has no sparse fast path yet; raise "
                'gb.config["dense_limit"] to force it on a small matrix.'
            )
        from .engine import sparse as spx

        vals, valid = spx.densify(sp, self.dtype)
        dist = self._dist  # representation change only: keep distribution
        self._set_store(vals, valid)
        self._dist = dist

    def _new_like(self, dtype, name=None):
        raise NotImplementedError

    # ------------------------------------------------------------------ #
    # the (mask, accum, replace) protocol
    def __call__(self, *optional, mask=None, accum=None, replace=False,
                 input_mask=None, _mask_shape=None, **opts):
        from graphblas_tpu import replace as replace_singleton

        from .expr import Updater

        for arg in optional:
            if arg is replace_singleton:
                replace = True
            elif isinstance(arg, Mask):
                if mask is not None:
                    raise TypeError("Got multiple masks")
                mask = arg
            elif isinstance(arg, BaseType) or (
                hasattr(arg, "output_type") and not isinstance(arg, (OpBase, TypedOpBase))
            ):
                raise TypeError(
                    "Mask must indicate values (M.V) or structure (M.S)"
                )
            else:
                op, opclass = find_opclass(arg)
                if opclass == "UnknownOpClass":
                    raise TypeError(f"Invalid item found in output params: {type(arg)}")
                if opclass not in ("BinaryOp", "Monoid"):
                    raise TypeError(f"accum must be a BinaryOp, not {opclass}")
                if accum is not None:
                    raise TypeError("Got multiple accum")
                accum = op
        if mask is not None:
            if _mask_shape is not None:
                mask = _check_mask(mask)
                region_shape = tuple(_mask_shape)
                if mask.parent.ndim != len(region_shape):
                    # reference error contract (matrix.py:2905+)
                    kind = "Vector" if len(region_shape) == 1 else "Matrix"
                    got = "Matrix" if mask.parent.ndim == 2 else "Vector"
                    raise TypeError(
                        f"Indices for subassign imply {kind} submask, "
                        f"but got {got} mask instead"
                    )
                if mask.parent.shape != region_shape:
                    raise DimensionMismatch(
                        f"mask shape {mask.parent.shape} does not match "
                        f"region shape {region_shape}"
                    )
            else:
                mask = _check_mask(mask, self)
        if input_mask is not None:
            if mask is not None:
                raise TypeError("mask and input_mask arguments cannot both be given")
            input_mask = _check_mask(input_mask)
        if replace and mask is None:
            raise TypeError(
                "'replace' argument may only be True if a mask is provided")
        if accum is not None:
            if isinstance(accum, str):
                # "plus" / "+" accum strings (reference test_vector.py:361)
                from .operator.utils import binary_from_string

                accum = binary_from_string(accum)
            accum = _expect_op(self, accum, ("BinaryOp", "Monoid"), within="accum")
            if find_opclass(accum)[1] == "Monoid":
                accum = accum.binaryop
        return Updater(self, mask=mask, accum=accum, replace=replace,
                       input_mask=input_mask, opts=opts)

    def __lshift__(self, expr):
        self.update(expr)
        # reference semantics: `C << expr` is a statement, not an expression

    def update(self, expr, **opts):
        self._update(expr, **opts)

    def _update(self, expr, mask=None, accum=None, replace=False, input_mask=None,
                opts=None):
        from . import execute
        from .expr import AmbiguousAssignOrExtract, InfixExprBase

        if isinstance(expr, InfixExprBase):
            expr = expr._to_expr()
        if isinstance(expr, AmbiguousAssignOrExtract):
            if input_mask is not None:
                expr = expr._extract_with_input_mask(input_mask)
                input_mask = None
            else:
                expr = expr._as_extract_expr()
        elif input_mask is not None:
            raise TypeError("`input_mask` argument may only be used for extract")
        from .matrix import TransposedMatrix

        if isinstance(expr, (BaseType, TransposedMatrix)):
            expr = execute.make_identity_expr(expr, self.dtype)
        if not isinstance(expr, BaseExpression):
            from .scalar import _is_scalar_like

            if self._is_scalar and _is_scalar_like(expr):
                self._update_from_value(expr, accum=accum)
                return
            if _is_scalar_like(expr) and not self._is_scalar:
                # C << scalar / C(M) << scalar assigns to ALL elements
                # (reference test_matrix.py:624-628)
                from .expr import IndexerResolver

                keys = (slice(None),) * self.ndim
                self._assign_at(IndexerResolver(self, keys), expr, mask=mask,
                                accum=accum, replace=replace,
                                is_submask=False)
                return
            raise TypeError(f"assignment value must be an expression; got {type(expr)}")
        if expr.output_type is not type(self):
            # allow Vector <- ScalarExpression etc to fail clearly
            if expr.ndim != self.ndim:
                raise TypeError(
                    f"Expression output type {expr.output_type.__name__} does not "
                    f"match target {type(self).__name__}"
                )
        if expr.shape != self.shape:
            raise DimensionMismatch(
                f"Expression shape {expr.shape} does not match target shape {self.shape}"
            )
        if mask is not None and mask.parent.shape != self.shape:
            # vector masks are only legal for row/col assign (handled in
            # _assign_at), not for whole-collection expression updates
            raise DimensionMismatch(
                f"mask shape {mask.parent.shape} does not match output shape "
                f"{self.shape}"
            )
        execute.update_into(self, expr, mask=mask, accum=accum, replace=replace,
                            opts=opts)

    def _as_identity_expr(self, out_dtype):
        """Wrap a plain collection as an identity expression (C(M) << A)."""
        from . import execute

        return execute.make_identity_expr(self, out_dtype)

    # ------------------------------------------------------------------ #
    @property
    def nvals(self):
        if self._nvals_cache is None:
            if self._sparse is not None:
                self._nvals_cache = self._sparse.nvals()
            else:
                self._nvals_cache = int(np.asarray(self._d_valid).sum())
        return self._nvals_cache

    def clear(self):
        import jax.numpy as jnp

        from .engine import store as st

        if self._sparse is not None:
            from .engine import sparse as spx

            sp = self._sparse
            self._set_sparse_store(
                spx.build_sparse_store(np.empty(0, np.int64), np.empty(0, np.int64),
                                       np.empty(0, self.dtype.np_type),
                                       sp.nrows, sp.ncols, self.dtype)
            )
            return
        self._set_store(st.zeros_values(self._d_valid.shape, self.dtype),
                        jnp.zeros(self._d_valid.shape, bool))

    def wait(self, how="materialize"):
        if how not in ("materialize", "complete"):
            raise ValueError(f'`how` argument must be "materialize" or "complete"; got {how!r}')
        import jax

        if self._sparse is not None:
            if how == "materialize":
                # the one place capacity compaction may block on a host read
                # (reference materialize semantics, matrix.py:778)
                from .execute import _maybe_compact

                self._set_sparse_store(_maybe_compact(self._sparse, force=True))
            jax.block_until_ready(self._sparse.vals)
            jax.block_until_ready(self._sparse.ok)
        else:
            jax.block_until_ready(self._d_vals)
            jax.block_until_ready(self._d_valid)
        return self

    def _host_arrays(self):
        """(values ndarray, valid ndarray) on host."""
        from .engine import store as st

        return (
            st.device_values_to_np(self._vals, self.dtype, self._valid.shape),
            np.asarray(self._valid),
        )

    def __bool__(self):
        raise TypeError(
            f"__bool__ not defined for objects of type {type(self).__name__}.  "
            "Perhaps use .nvals attribute instead."
        )

    def __array__(self, dtype=None, **kwargs):
        raise TypeError(
            f"{type(self).__name__} can't be directly converted to a numpy array; "
            "perhaps use `.to_coo()` or `.to_dense()`"
        )

    # common comparison entry points are defined per-class (isequal/isclose)


class BaseExpression:
    """A delayed operation: carries op + args + static config; no compute.

    Reference: core/base.py:515.  `.new()` materializes; used as the RHS of
    `<<` it flows through `_update` into one fused kernel.
    """

    __slots__ = (
        "method_name",
        "op",
        "args",
        "_statics",
        "_dyn_fn",
        "_trace_impl",
        "dtype",
        "_shape",
        "_out_cls",
        "_value",
        "_name",
        "__weakref__",
    )
    output_type = None  # class-level; instances use _out_cls

    def __init__(self, method_name, op, args, statics, trace_impl, dtype, shape,
                 out_cls, dyn_fn=None, name=None):
        self.method_name = method_name
        self.op = op
        self.args = args
        self._statics = statics
        self._trace_impl = trace_impl
        self.dtype = dtype
        self._shape = tuple(shape)
        self._out_cls = out_cls
        self._dyn_fn = dyn_fn
        self._value = None
        self._name = name

    # -- static key for jit cache (includes operand storage formats: the
    # same expression compiles separately per dense/sparse operand layout)
    def _key(self):
        return (self.method_name, self.op, self._statics, self.dtype,
                self._fmt_sig())

    def _fmt_sig(self):
        sig = []
        for a in self.args:
            if isinstance(a, BaseType):
                sp = a._sparse
                sig.append("d" if sp is None else sp._statics())
        return tuple(sig)

    def _dyn(self):
        if self._dyn_fn is not None:
            return self._dyn_fn()
        out = []
        for a in self.args:
            if isinstance(a, BaseType):
                sp = a._sparse
                out.append(sp._dyn() if sp is not None else (a._vals, a._valid))
            else:
                out.append(a)
        return tuple(out)

    @property
    def shape(self):
        return self._shape

    @property
    def ndim(self):
        return len(self._shape)

    @property
    def output_type(self):
        return self._out_cls

    @property
    def name(self):
        if self._name is not None:
            return self._name
        opname = getattr(self.op, "name", self.op)
        return f"{type(self).__name__.lower()}.{self.method_name}({opname})"

    @property
    def _name_html(self):
        return self.name

    # ------------------------------------------------------------------ #
    def new(self, dtype=None, *, mask=None, name=None, is_cscalar=None, **opts):
        from . import execute
        from .opts import validate_opts

        validate_opts(opts)
        if dtype is None:
            out_dtype = self.dtype
        else:
            out_dtype = lookup_dtype(dtype)
        if (
            mask is None
            and self._value is not None
            and (dtype is None or self._value.dtype == out_dtype)
        ):
            rv = self._value
            if name is not None:
                rv.name = name
            self._value = None
            return rv
        if mask is not None:
            mask = _check_mask(mask)
        return execute.materialize(self, out_dtype, mask=mask, name=name,
                                   is_cscalar=is_cscalar, opts=opts)

    dup = new

    def _get_value(self, attr=None, default=None):
        from .config import config

        if not config.get("autocompute"):
            if default is not None:
                return default
            raise TypeError(
                f"{type(self).__name__} is not computed automatically because "
                "`gb.config['autocompute']` is False.  Call `.new()` to compute."
            )
        if self._value is None:
            self._value = self.new()
        if attr is None:
            return self._value
        rv = getattr(self._value, attr)
        return rv

    def __repr__(self):
        from . import formatting

        return formatting.format_expression(self)

    def _repr_html_(self):
        return f"<pre>{self!r}</pre>"

    def __getattr__(self, attr):
        # autocompute: delegate unknown attributes to the computed value
        if attr.startswith("_") or attr in ("method_name", "op", "args", "dtype"):
            raise AttributeError(attr)
        return self._get_value(attr=attr)


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from .utils import x64_methods as _x64_methods  # noqa: E402
BaseType = _x64_methods(BaseType)
BaseExpression = _x64_methods(BaseExpression)
