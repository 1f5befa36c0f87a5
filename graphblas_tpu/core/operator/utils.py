"""Operator resolution utilities.

Parity target: reference core/operator/utils.py (get_typed_op:38,
get_semiring:135, from_string parsers :330-447, alias tables :273-316).
"""

from types import BuiltinFunctionType, FunctionType, ModuleType

import numpy as np

from .. import dtypes as _dt
from ..dtypes import lookup_dtype, unify
from .base import OpBase, ParameterizedUdf, TypedOpBase, find_opclass
from .semiring import Semiring, get_semiring_obj

__all__ = [
    "get_typed_op",
    "get_semiring",
    "unary_from_string",
    "binary_from_string",
    "monoid_from_string",
    "semiring_from_string",
    "indexunary_from_string",
    "select_from_string",
    "aggregator_from_string",
    "op_from_string",
]

_builtin_to_op = {}  # python builtins (abs, min, max) -> op; filled by _initialize


class OpPath:
    """Container for dotted op namespaces (e.g. gb.unary.numpy)."""

    def __init__(self, parent, name):
        self._parent = parent
        self._name = name


def _register_into_namespace(modname, name, op):
    import importlib

    module = importlib.import_module(f"graphblas_tpu.{modname}")
    path = name.split(".")
    cur = module
    for part in path[:-1]:
        nxt = getattr(cur, part, None)
        if nxt is None:
            nxt = OpPath(cur, part)
            setattr(cur, part, nxt)
        elif not isinstance(nxt, (OpPath, ModuleType)):
            raise AttributeError(f"{part} is already taken in {modname} namespace")
        cur = nxt
    leaf = path[-1]
    # look only at already-materialized names (module __getattr__ may be a
    # lazy builder that would *create* the name being registered)
    existing = vars(cur).get(leaf) if isinstance(cur, ModuleType) else getattr(cur, leaf, None)
    if existing is not None and not isinstance(existing, (OpPath, ModuleType)):
        raise AttributeError(f"{name} is already defined in gb.{modname}")
    setattr(cur, leaf, op)
    # also mirror into the combined `op` namespace for top-level names
    if modname in ("unary", "binary", "monoid", "semiring") and len(path) == 1:
        opmod = importlib.import_module("graphblas_tpu.op")
        if getattr(opmod, leaf, None) is None:
            setattr(opmod, leaf, op)


def get_typed_op(op, dtype, dtype2=None, *, is_left_scalar=False, is_right_scalar=False, kind=None):
    """Resolve an op-like object + operand dtypes to a typed op.

    Reference: core/operator/utils.py:38.
    """
    if isinstance(op, OpBase):
        if op._is_udt:
            return op._compile_udt(dtype, dtype2 if dtype2 is not None else dtype)
        if dtype2 is None:
            return op[dtype]
        if op._custom_dtype is not None and (rv := op._custom_dtype(op, dtype, dtype2)) is not None:
            return rv
        try:
            return op[
                unify(dtype, dtype2, is_left_scalar=is_left_scalar, is_right_scalar=is_right_scalar)
            ]
        except (TypeError, AttributeError, KeyError):
            if op.is_positional:
                return op[_dt.INT64]
            if op._udt_func is None:
                raise
            return op._compile_udt(dtype, dtype2)
    if isinstance(op, ParameterizedUdf):
        return get_typed_op(
            op(), dtype, dtype2,
            is_left_scalar=is_left_scalar, is_right_scalar=is_right_scalar, kind=kind,
        )
    if isinstance(op, TypedOpBase):
        return op

    from .agg import Aggregator, TypedAggregator

    if isinstance(op, Aggregator):
        return op[dtype]
    if isinstance(op, TypedAggregator):
        return op
    if isinstance(op, str):
        if kind == "unary":
            op = unary_from_string(op)
        elif kind == "select":
            op = select_from_string(op)
        elif kind == "binary":
            op = binary_from_string(op)
        elif kind == "monoid":
            op = monoid_from_string(op)
        elif kind == "semiring":
            op = semiring_from_string(op)
        elif kind == "indexunary":
            op = indexunary_from_string(op)
        elif kind == "binary|aggregator":
            try:
                op = binary_from_string(op)
            except ValueError:
                try:
                    op = aggregator_from_string(op)
                except ValueError:
                    raise ValueError(
                        f"Unknown binary or aggregator string: {op!r}.  "
                        "Example usage: '+[int]'"
                    ) from None
        else:
            raise ValueError(
                f"Unable to get op from string {op!r}.  `kind=` argument must be provided as "
                '"unary", "binary", "monoid", "semiring", "indexunary", "select", '
                'or "binary|aggregator".'
            )
        return get_typed_op(
            op, dtype, dtype2,
            is_left_scalar=is_left_scalar, is_right_scalar=is_right_scalar, kind=kind,
        )
    if isinstance(op, FunctionType):
        from .binary import BinaryOp
        from .unary import UnaryOp

        if kind == "unary":
            op = UnaryOp.register_anonymous(op, is_udt=True)
            return op._compile_udt(dtype, dtype2 if dtype2 is not None else dtype)
        if kind is not None and kind.startswith("binary"):
            op = BinaryOp.register_anonymous(op, is_udt=True)
            return op._compile_udt(dtype, dtype2 if dtype2 is not None else dtype)
    if isinstance(op, BuiltinFunctionType) and op in _builtin_to_op:
        return get_typed_op(
            _builtin_to_op[op], dtype, dtype2,
            is_left_scalar=is_left_scalar, is_right_scalar=is_right_scalar, kind=kind,
        )
    raise TypeError(f"Unable to get typed operator from object with type {type(op)}")


def get_semiring(monoid, binaryop, name=None):
    return get_semiring_obj(monoid, binaryop, name)


# ---------------------------------------------------------------------- #
# op(...) call dispatch (reference core/operator/base.py:110 _call_op)
def _call_op(op, left, right=None, *, left_default=None, right_default=None):
    from ..base import BaseExpression, BaseType
    from ..expr import AmbiguousAssignOrExtract
    from ..infix import InfixExprBase

    # autocompute: expression operands materialize (reference automethods)
    if isinstance(left, (BaseExpression, AmbiguousAssignOrExtract)):
        left = left._get_value()
    if isinstance(right, (BaseExpression, AmbiguousAssignOrExtract)):
        right = right._get_value()
    if right is None and left_default is None and right_default is None:
        if isinstance(left, InfixExprBase):
            return left._apply_op(op)
        from .agg import Aggregator, TypedAggregator

        if isinstance(op, (Aggregator, TypedAggregator)) and isinstance(left, BaseType):
            if left.ndim == 2:
                return left.reduce_scalar(op)
            return left.reduce(op)
        raise TypeError(
            f"Bad type when calling {op!r}.\n"
            "    - Expected an infix expression, such as: "
            f"{op!r}(x & y)\n"
            "    - Or a combination of a collection and a scalar, such as: "
            f"{op!r}(x, 1)"
        )
    if left_default is not None or right_default is not None:
        # ewise_union-style call: op(x | y, left_default=0, right_default=0)
        if (
            left_default is None
            or right_default is None
            or right is not None
            or not isinstance(left, InfixExprBase)
            or left.method_name != "ewise_add"
        ):
            raise TypeError(
                f"Bad arguments when calling {op!r}.  Specify both left_default and "
                f"right_default when calling with an ewise-union infix expression, e.g.:\n"
                f"    {op!r}(x | y, left_default=0, right_default=0)"
            )
        return left.left.ewise_union(left.right, op, left_default, right_default)
    # op(collection, scalar) or op(scalar, collection)
    from ..scalar import _is_scalar_like

    if isinstance(left, BaseType) and not _is_scalar_like(right) and isinstance(right, BaseType):
        raise TypeError(
            f"Bad types when calling {op!r}.  Got {type(left)} and {type(right)}.\n"
            "    When calling with two arguments, one must be a scalar."
        )
    if isinstance(left, BaseType):
        return left.apply(op, right=right)
    if isinstance(right, BaseType):
        return right.apply(op, left=left)
    raise TypeError(
        f"Bad types when calling {op!r}.  Got {type(left)} and {type(right)}.\n"
        "    At least one argument must be a Matrix, Vector, or Scalar."
    )


def _call_op_unary(op, val):
    from ..base import BaseExpression, BaseType
    from ..expr import AmbiguousAssignOrExtract, InfixExprBase

    if isinstance(val, (BaseExpression, AmbiguousAssignOrExtract, InfixExprBase)):
        val = val._get_value()
    if isinstance(val, BaseType):
        return val.apply(op)
    raise TypeError(f"Bad type when calling {op!r}: {type(val)}")


# ---------------------------------------------------------------------- #
# from_string parsers (reference :273-447)
_str_to_unary = {"-": "ainv", "~": "lnot"}
_str_to_select = {
    "<": "valuelt",
    ">": "valuegt",
    "<=": "valuele",
    ">=": "valuege",
    "!=": "valuene",
    "==": "valueeq",
    "col<=": "colle",
    "col>": "colgt",
    "row<=": "rowle",
    "row>": "rowgt",
    "index<=": "indexle",
    "index>": "indexgt",
}
_str_to_binary = {
    "<": "lt",
    ">": "gt",
    "<=": "le",
    ">=": "ge",
    "!=": "ne",
    "==": "eq",
    "+": "plus",
    "-": "minus",
    "*": "times",
    "/": "truediv",
    "//": "floordiv",
    "%": "numpy.mod",
    "**": "pow",
    "&": "land",
    "|": "lor",
    "^": "lxor",
}
_str_to_monoid = {
    "==": "eq",
    "+": "plus",
    "*": "times",
    "&": "land",
    "|": "lor",
    "^": "lxor",
}
_str_to_agg = {"+": "sum", "*": "prod", "&": "all", "|": "any"}


def _from_string(string, modname, mapping, example):
    import importlib

    module = importlib.import_module(f"graphblas_tpu.{modname}")
    s = string.lower().strip()
    base, *dtype = s.split("[")
    if len(dtype) > 1:
        raise ValueError(
            f'Bad {modname} string: {string!r}.  Contains too many "[".  '
            f"Example usage: {example!r}"
        )
    if dtype:
        dtype = dtype[0]
        if not dtype.endswith("]"):
            raise ValueError(
                f'Bad {modname} string: {string!r}.  Datatype specification does not '
                f'end with "]".  Example usage: {example!r}'
            )
        dtype = lookup_dtype(dtype[:-1])
    if "]" in base:
        raise ValueError(
            f'Bad {modname} string: {string!r}.  "]" not matched by "[".  '
            f"Example usage: {example!r}"
        )
    op = None
    if base in mapping:
        mapped = mapping[base]
        op = getattr(module, mapped) if isinstance(mapped, str) else mapped
    elif hasattr(module, base):
        op = getattr(module, base)
    elif hasattr(module, "numpy") and hasattr(module.numpy, base):
        op = getattr(module.numpy, base)
    else:
        *paths, attr = base.split(".")
        cur = module
        for path in paths:
            cur = getattr(cur, path, None)
            if not isinstance(cur, (OpPath, ModuleType)):
                cur = None
                break
        op = getattr(cur, attr, None)
        if op is None:
            raise ValueError(
                f"Unknown {modname} string: {string!r}.  Example usage: {example!r}"
            )
    if dtype:
        op = op[dtype]
    return op


def unary_from_string(string):
    return _from_string(string, "unary", _str_to_unary, "abs[int]")


def indexunary_from_string(string):
    return _from_string(string, "indexunary", _str_to_select, "row_index")


def select_from_string(string):
    return _from_string(string, "select", _str_to_select, "tril")


def binary_from_string(string):
    return _from_string(string, "binary", _str_to_binary, "+[int]")


def monoid_from_string(string):
    return _from_string(string, "monoid", _str_to_monoid, "+[int]")


def semiring_from_string(string):
    split = string.split(".")
    if len(split) == 1:
        try:
            return _from_string(string, "semiring", {}, "min.+[int]")
        except Exception:  # noqa: BLE001
            pass
    if len(split) != 2:
        raise ValueError(
            f"Bad semiring string: {string!r}.  "
            'The monoid and binaryop should be separated by exactly one period, ".".  '
            "Example usage: min.+[int]"
        )
    cur_monoid = monoid_from_string(split[0])
    cur_binary = binary_from_string(split[1])
    return get_semiring(cur_monoid, cur_binary)


def aggregator_from_string(string):
    return _from_string(string, "agg", _str_to_agg, "sum[int]")


def op_from_string(string):
    for func in [
        unary_from_string,
        binary_from_string,
        monoid_from_string,
        semiring_from_string,
        indexunary_from_string,
        select_from_string,
        aggregator_from_string,
    ]:
        try:
            return func(string)
        except Exception:  # noqa: BLE001
            pass
    raise ValueError(f"Unknown op string: {string!r}.  Example usage: 'abs[int]'")
