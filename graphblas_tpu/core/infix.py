"""Infix expressions (`x | y`, `x & y`, `x @ y`) + Python arithmetic methods.

Parity targets: reference core/infix.py (typed infix classes,
_ewise_*_to_expr BOOL-only auto ops :18-44), core/infixmethods.py (full
Python arithmetic -> GraphBLAS calls), core/automethods.py (autocompute:
every method/property works transparently on expressions).  The reference
generates ~500 properties with a codegen script; here autocompute is
implemented with `__getattr__` delegation (see expr.InfixExprBase and
base.BaseExpression) plus an explicit dunder installation loop below, which
is behaviorally equivalent and has no generated code to drift.
"""

import numpy as np

from ..exceptions import DimensionMismatch
from .base import BaseExpression, BaseType
from .dtypes import BOOL, lookup_dtype
from .expr import AmbiguousAssignOrExtract, InfixExprBase
from .mask import Mask
from .matrix import Matrix, TransposedMatrix
from .scalar import Scalar, _is_scalar_like
from .utils import _output_types, output_type
from .vector import Vector


def _ewise_add_to_expr(self):
    if self._expr is not None:
        return self._expr
    if self.left.dtype == BOOL and self.right.dtype == BOOL:
        from graphblas_tpu.monoid import lor

        self._expr = self.left.ewise_add(self.right, lor)
        return self._expr
    raise TypeError(
        "Bad dtypes for `x | y`!  Automatic computation of `x | y` infix expressions "
        f"is only valid for BOOL dtypes.  The argument dtypes are {self.left.dtype} "
        f"and {self.right.dtype}.\n\nWhen auto-computed for boolean dtypes, `x | y` "
        "performs ewise_add (union) using LOR.\n\nTypical usage is to create an "
        "ewise_add expression such as `monoid.plus(x | y)`."
    )


def _ewise_mult_to_expr(self):
    if self._expr is not None:
        return self._expr
    if self.left.dtype == BOOL and self.right.dtype == BOOL:
        from graphblas_tpu.monoid import land

        self._expr = self.left.ewise_mult(self.right, land)
        return self._expr
    raise TypeError(
        "Bad dtypes for `x & y`!  Automatic computation of `x & y` infix expressions "
        f"is only valid for BOOL dtypes.  The argument dtypes are {self.left.dtype} "
        f"and {self.right.dtype}.\n\nWhen auto-computed for boolean dtypes, `x & y` "
        "performs ewise_mult (intersection) using LAND.\n\nTypical usage is to create "
        "an ewise_mult expression such as `monoid.times(x & y)`."
    )


class ScalarInfixExpr(InfixExprBase):
    __slots__ = ()
    ndim = 0
    shape = ()
    _is_scalar = True
    output_type = Scalar

    @property
    def is_cscalar(self):
        return False

    @property
    def is_grbscalar(self):
        return True


class ScalarEwiseAddExpr(ScalarInfixExpr):
    __slots__ = ()
    method_name = "ewise_add"
    _example_op = "plus"
    _infix = "|"
    _to_expr = _ewise_add_to_expr


class ScalarEwiseMultExpr(ScalarInfixExpr):
    __slots__ = ()
    method_name = "ewise_mult"
    _example_op = "times"
    _infix = "&"
    _to_expr = _ewise_mult_to_expr


class ScalarMatMulExpr(ScalarInfixExpr):
    __slots__ = ()
    method_name = "inner"
    _example_op = "plus_times"
    _infix = "@"


class VectorInfixExpr(InfixExprBase):
    __slots__ = "_size"
    ndim = 1
    output_type = Vector

    def __init__(self, left, right):
        super().__init__(left, right)
        self._size = left.shape[0] if len(left.shape) == 1 else left.shape[0]

    @property
    def size(self):
        return self._size

    @property
    def shape(self):
        return (self._size,)


class VectorEwiseAddExpr(VectorInfixExpr):
    __slots__ = ()
    method_name = "ewise_add"
    _example_op = "plus"
    _infix = "|"
    _to_expr = _ewise_add_to_expr


class VectorEwiseMultExpr(VectorInfixExpr):
    __slots__ = ()
    method_name = "ewise_mult"
    _example_op = "times"
    _infix = "&"
    _to_expr = _ewise_mult_to_expr


class VectorMatMulExpr(VectorInfixExpr):
    __slots__ = "method_name"
    _example_op = "plus_times"
    _infix = "@"

    def __init__(self, left, right, *, method_name, size):
        InfixExprBase.__init__(self, left, right)
        self.method_name = method_name
        self._size = size


class MatrixInfixExpr(InfixExprBase):
    __slots__ = "_nrows", "_ncols"
    ndim = 2
    output_type = Matrix

    def __init__(self, left, right):
        super().__init__(left, right)
        if len(left.shape) == 2:
            self._nrows, self._ncols = left.shape
        else:
            self._nrows, self._ncols = right.shape

    @property
    def nrows(self):
        return self._nrows

    @property
    def ncols(self):
        return self._ncols

    @property
    def shape(self):
        return (self._nrows, self._ncols)


class MatrixEwiseAddExpr(MatrixInfixExpr):
    __slots__ = ()
    method_name = "ewise_add"
    _example_op = "plus"
    _infix = "|"
    _to_expr = _ewise_add_to_expr


class MatrixEwiseMultExpr(MatrixInfixExpr):
    __slots__ = ()
    method_name = "ewise_mult"
    _example_op = "times"
    _infix = "&"
    _to_expr = _ewise_mult_to_expr


class MatrixMatMulExpr(MatrixInfixExpr):
    __slots__ = ()
    method_name = "mxm"
    _example_op = "plus_times"
    _infix = "@"

    def __init__(self, left, right, *, nrows, ncols):
        InfixExprBase.__init__(self, left, right)
        self._nrows = nrows
        self._ncols = ncols


_COLLECTION_TYPES = None


def _coll_types():
    global _COLLECTION_TYPES
    if _COLLECTION_TYPES is None:
        _COLLECTION_TYPES = {Vector, Matrix, TransposedMatrix}
    return _COLLECTION_TYPES


def _ewise_infix_expr(left, right, *, method, within):
    from graphblas_tpu.binary import any as binary_any

    types = _coll_types()
    left_type = output_type(left)
    right_type = output_type(right)
    if left_type in types and right_type in types:
        expr = getattr(left, method)(right, binary_any)  # dimension check
        if expr.output_type is Vector:
            return (VectorEwiseMultExpr if method == "ewise_mult"
                    else VectorEwiseAddExpr)(left, right)
        return (MatrixEwiseMultExpr if method == "ewise_mult"
                else MatrixEwiseAddExpr)(left, right)
    if within == "__or__" and isinstance(right, Mask):
        return right.__ror__(left)
    if within == "__and__" and isinstance(right, Mask):
        return right.__rand__(left)
    if left_type in types:
        left._expect_type(right, tuple(types), within=within, argname="right")
    elif right_type in types:
        right._expect_type(left, tuple(types), within=within, argname="left")
    elif left_type is Scalar:
        getattr(left, method)(right, binary_any)
        return (ScalarEwiseMultExpr if method == "ewise_mult"
                else ScalarEwiseAddExpr)(left, right)
    elif right_type is Scalar:
        getattr(right, method)(left, binary_any)
        return (ScalarEwiseMultExpr if method == "ewise_mult"
                else ScalarEwiseAddExpr)(right, left)
    else:
        raise TypeError(
            f"Bad types for ewise infix: {type(left).__name__}, {type(right).__name__}"
        )


def _matmul_infix_expr(left, right, *, within):
    from graphblas_tpu.semiring import any_pair

    left_type = output_type(left)
    right_type = output_type(right)
    if left_type is Vector:
        if right_type in (Matrix, TransposedMatrix):
            method = "vxm"
        elif right_type is Vector:
            method = "inner"
        else:
            right = left._expect_type(right, (Matrix, TransposedMatrix),
                                      within=within, argname="right")
    elif left_type in (Matrix, TransposedMatrix):
        if right_type is Vector:
            method = "mxv"
        elif right_type in (Matrix, TransposedMatrix):
            method = "mxm"
        else:
            right = left._expect_type(right, (Vector, Matrix, TransposedMatrix),
                                      within=within, argname="right")
    elif right_type is Vector:
        left = right._expect_type(left, (Matrix, TransposedMatrix),
                                  within=within, argname="left")
    elif right_type in (Matrix, TransposedMatrix):
        left = right._expect_type(left, (Vector, Matrix, TransposedMatrix),
                                  within=within, argname="left")
    else:
        raise TypeError(
            f"Bad types for matmul infix: {type(left).__name__}, {type(right).__name__}"
        )
    expr = getattr(left, method)(right, any_pair[bool])  # dimension check
    if expr.output_type is Vector:
        return VectorMatMulExpr(left, right, method_name=method,
                                size=expr._shape[0])
    if expr.output_type is Matrix:
        return MatrixMatMulExpr(left, right, nrows=expr._shape[0],
                                ncols=expr._shape[1])
    return ScalarMatMulExpr(left, right)


# ---------------------------------------------------------------------- #
# install __or__ / __and__ / __matmul__ on collections
def __or__(self, other):
    return _ewise_infix_expr(self, other, method="ewise_add", within="__or__")


def __ror__(self, other):
    return _ewise_infix_expr(other, self, method="ewise_add", within="__or__")


def __and__(self, other):
    return _ewise_infix_expr(self, other, method="ewise_mult", within="__and__")


def __rand__(self, other):
    return _ewise_infix_expr(other, self, method="ewise_mult", within="__and__")


def __matmul__(self, other):
    return _matmul_infix_expr(self, other, within="__matmul__")


def __rmatmul__(self, other):
    return _matmul_infix_expr(other, self, within="__rmatmul__")


def _scalar_matmul(self, other):
    raise TypeError("Scalar objects not supported for matmul: @")


for _cls in (Vector, Matrix, TransposedMatrix):
    _cls.__or__ = __or__
    _cls.__ror__ = __ror__
    _cls.__and__ = __and__
    _cls.__rand__ = __rand__
    _cls.__matmul__ = __matmul__
    _cls.__rmatmul__ = __rmatmul__
Scalar.__or__ = __or__
Scalar.__ror__ = __ror__
Scalar.__and__ = __and__
Scalar.__rand__ = __rand__
Scalar.__matmul__ = _scalar_matmul
Scalar.__rmatmul__ = _scalar_matmul


# ---------------------------------------------------------------------- #
# infixmethods: Python arithmetic -> GraphBLAS (reference core/infixmethods.py)
def _call_binop(self, other, opname, *, outer=False, union=False, reverse=False):
    import graphblas_tpu.binary as binary_ns

    op = getattr(binary_ns, opname) if isinstance(opname, str) else opname
    left, right = (other, self) if reverse else (self, other)
    type1 = output_type(left)
    type2 = output_type(right)
    types = {Matrix, TransposedMatrix, Vector}
    if type1 in types:
        if type2 in types:
            if outer:
                return left.ewise_add(right, op)
            if union:
                return left.ewise_union(right, op, False, False)
            return left.ewise_mult(right, op)
        return op(left, right)
    if type2 in types:
        return op(left, right)
    # scalar cases
    if type1 is Scalar:
        if outer:
            return left.ewise_add(right, op)
        if union:
            return left.ewise_union(right, op, False, False)
        return left.ewise_mult(right, op)
    if type2 is Scalar:
        commuted = op.commutes_to if hasattr(op, "commutes_to") else None
        if outer:
            return right.ewise_add(left, commuted if commuted is not None else op)
        if union:
            return right.ewise_union(left, commuted if commuted is not None else op,
                                     False, False)
        return right.ewise_mult(left, commuted if commuted is not None else op)
    raise TypeError(
        f"Bad types for operation: {type(left).__name__}, {type(right).__name__}"
    )


def _mod_op():
    import graphblas_tpu.binary as binary_ns

    return binary_ns.numpy.mod


_ARITH = {
    "__add__": ("plus", {"outer": True}, False),
    "__radd__": ("plus", {"outer": True}, True),
    "__sub__": ("minus", {"union": True}, False),
    "__rsub__": ("minus", {"union": True}, True),
    "__mul__": ("times", {}, False),
    "__rmul__": ("times", {}, True),
    "__truediv__": ("truediv", {}, False),
    "__rtruediv__": ("truediv", {}, True),
    "__floordiv__": ("floordiv", {}, False),
    "__rfloordiv__": ("floordiv", {}, True),
    "__pow__": ("pow", {}, False),
    "__rpow__": ("pow", {}, True),
    "__eq__": ("eq", {}, False),
    "__ne__": ("ne", {}, False),
    "__lt__": ("lt", {}, False),
    "__le__": ("le", {}, False),
    "__gt__": ("gt", {}, False),
    "__ge__": ("ge", {}, False),
}


def _make_arith(opname, kwargs, reverse):
    def method(self, other):
        return _call_binop(self, other, opname, reverse=reverse, **kwargs)

    return method


def __mod__(self, other):
    return _call_binop(self, other, _mod_op())


def __rmod__(self, other):
    return _call_binop(self, other, _mod_op(), reverse=True)


def __divmod__(self, other):
    return (_call_binop(self, other, "floordiv"), __mod__(self, other))


def __rdivmod__(self, other):
    return (_call_binop(self, other, "floordiv", reverse=True),
            __rmod__(self, other))


def __neg__(self):
    from graphblas_tpu.unary import ainv

    return ainv(self)


def __abs__(self):
    from graphblas_tpu import unary

    return unary.abs(self)


def __xor__(self, other):
    expr = _call_binop(self, other, "lxor", outer=True)
    if expr.dtype != BOOL:
        raise TypeError(
            f"The __xor__ infix operator, `x ^ y`, is not supported for "
            f"{expr.dtype.name} dtype.  It is only supported for BOOL dtype "
            "(and it uses ewise_add--the union)."
        )
    return expr


def __rxor__(self, other):
    expr = _call_binop(self, other, "lxor", outer=True, reverse=True)
    if expr.dtype != BOOL:
        raise TypeError(
            f"The __xor__ infix operator, `x ^ y`, is not supported for "
            f"{expr.dtype.name} dtype.  It is only supported for BOOL dtype "
            "(and it uses ewise_add--the union)."
        )
    return expr


_TARGET_CLASSES = [Vector, Matrix, Scalar, TransposedMatrix, BaseExpression,
                   InfixExprBase, AmbiguousAssignOrExtract]

for _cls in _TARGET_CLASSES:
    for _name, (_opname, _kw, _rev) in _ARITH.items():
        if _cls is AmbiguousAssignOrExtract and _name in ("__eq__", "__ne__"):
            continue  # AAOE defines its own value-compare semantics
        setattr(_cls, _name, _make_arith(_opname, _kw, _rev))
    _cls.__mod__ = __mod__
    _cls.__rmod__ = __rmod__
    _cls.__divmod__ = __divmod__
    _cls.__rdivmod__ = __rdivmod__
    _cls.__neg__ = __neg__
    _cls.__abs__ = __abs__
    _cls.__xor__ = __xor__
    _cls.__rxor__ = __rxor__
    # Scalars define value-equality __eq__ and are unhashable, matching the
    # reference (tests/test_scalar.py:251); collections stay identity-hashed
    _cls.__hash__ = None if _cls is Scalar else object.__hash__


# autocompute dunders for expressions: delegate to the computed value
def _make_delegate(name):
    def method(self, *args, **kwargs):
        value = self._get_value()
        return getattr(value, name)(*args, **kwargs)

    return method


for _cls in (BaseExpression, InfixExprBase):
    for _name in ("__int__", "__float__", "__complex__", "__index__", "__bool__",
                  "__iter__", "__contains__", "__array__", "__invert__"):
        setattr(_cls, _name, _make_delegate(_name))
    _cls.__or__ = __or__
    _cls.__ror__ = __ror__
    _cls.__and__ = __and__
    _cls.__rand__ = __rand__
    _cls.__matmul__ = __matmul__
    _cls.__rmatmul__ = __rmatmul__

for _name in ("__int__", "__float__", "__complex__", "__index__", "__bool__",
              "__iter__", "__contains__"):
    setattr(AmbiguousAssignOrExtract, _name, _make_delegate(_name))

_output_types[BaseExpression] = BaseExpression
_output_types[AmbiguousAssignOrExtract] = AmbiguousAssignOrExtract
for _icls in (ScalarEwiseAddExpr, ScalarEwiseMultExpr, ScalarMatMulExpr):
    _output_types[_icls] = Scalar
for _icls in (VectorEwiseAddExpr, VectorEwiseMultExpr, VectorMatMulExpr):
    _output_types[_icls] = Vector
for _icls in (MatrixEwiseAddExpr, MatrixEwiseMultExpr, MatrixMatMulExpr):
    _output_types[_icls] = Matrix


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from .utils import x64_methods as _x64_methods  # noqa: E402
ScalarInfixExpr = _x64_methods(ScalarInfixExpr)
VectorInfixExpr = _x64_methods(VectorInfixExpr)
MatrixInfixExpr = _x64_methods(MatrixInfixExpr)
