"""Container namespace for SelectOp objects plus expression-rewriting helpers.

Reference: graphblas/select/__init__.py — the ``value``/``row``/``column``/
``index`` helpers (:90-143) rewrite comparison expressions like ``A < 5``
into select calls, and ``_match_expr`` (:71) lets ``A.select(A < 5)`` work.
"""

from ..core.operator.select import SelectOp as _SelectOp
from ..core.operator.select import _initialize_builtins as _init

register_new = _SelectOp.register_new
register_anonymous = _SelectOp.register_anonymous

_ops = _init({})
globals().update(_ops)
indexle = _ops["rowle"]
indexgt = _ops["rowgt"]


def from_string(string):
    from ..core.operator.utils import select_from_string

    return select_from_string(string)


class _SSNamespace:
    """gb.select.ss — engine-JIT registration
    (reference select/ss.py, core/ss/select.py:26)."""

    @staticmethod
    def register_new(name, jit_definition, input_type=None, thunk_type=None):
        from ..core.ss.jit import register_new_select

        return register_new_select(name, jit_definition, input_type,
                                   thunk_type)


ss = _SSNamespace()


_COMPARE_TO_VALUE = {
    "lt": "valuelt",
    "gt": "valuegt",
    "le": "valuele",
    "ge": "valuege",
    "eq": "valueeq",
    "ne": "valuene",
    "iseq": "valueeq",
    "isne": "valuene",
    "islt": "valuelt",
    "isgt": "valuegt",
    "isle": "valuele",
    "isge": "valuege",
}
_COMPARE_TO_ROW = {"le": "rowle", "gt": "rowgt", "lt": "_rowlt", "ge": "_rowge"}
_COMPARE_TO_COL = {"le": "colle", "gt": "colgt", "lt": "_collt", "ge": "_colge"}


def _match_expr(parent, expr):
    """If expr is `parent <op> scalar` (an apply with a comparison), return
    the equivalent (select_op, thunk); else None.  Reference select/__init__.py:71."""
    from ..core.base import BaseExpression

    if not isinstance(expr, BaseExpression):
        return None
    op = expr.op
    opname = op.name if hasattr(op, "name") else None
    selname = _COMPARE_TO_VALUE.get(opname)
    if selname is None:
        return None
    args = expr.args
    if expr.method_name == "apply":
        if len(args) < 2 or args[0] is not parent:
            return None
        return _ops[selname], args[1]
    if (expr.method_name == "ewise_mult" and getattr(parent, "_is_scalar",
                                                    False)):
        # Scalar comparisons route through scalar-scalar ewise
        # (select.value(s < 10), reference tests/test_scalar.py:550)
        if len(args) < 2 or args[0] is not parent:
            return None
        other = args[1]
        thunk = other.value if hasattr(other, "value") else other
        return _ops[selname], thunk
    return None


def _rewrite_compare(expr, table, what):
    from ..core.base import BaseExpression

    if not isinstance(expr, BaseExpression) or expr.method_name != "apply":
        raise TypeError(
            f"select.{what} argument must be a comparison expression such as "
            f"`A.rowindex() <= 5`"
        )
    raise TypeError(f"Unable to rewrite expression for select.{what}")


def value(expr):
    """``select.value(A < 5)`` — select by value comparison."""
    from ..core.base import BaseExpression

    if not isinstance(expr, BaseExpression):
        raise TypeError("select.value argument must be a comparison expression, e.g. A < 5")
    parent = expr.args[0] if expr.args else None
    match = _match_expr(parent, expr)
    if match is None:
        raise TypeError("select.value argument must be a comparison expression, e.g. A < 5")
    sel_op, thunk = match
    return parent.select(sel_op, thunk)


def _positional_select(expr, kind):
    """Handle select.row(A.rowindex() <= 5)-style and comparison-on-index exprs."""
    from ..core.base import BaseExpression

    if not isinstance(expr, BaseExpression) or expr.method_name != "apply":
        raise TypeError(f"select.{kind} argument must be a comparison expression")
    op = expr.op
    opname = getattr(op, "name", None)
    comp_map = {"row": _COMPARE_TO_ROW, "column": _COMPARE_TO_COL, "index": _COMPARE_TO_ROW}
    table = comp_map[kind]
    parent = expr.args[0]
    thunk = expr.args[1]
    name = table.get(opname)
    if name is None:
        raise TypeError(f"Unsupported comparison {opname!r} for select.{kind}")
    if name.startswith("_"):
        # rowlt t == rowle t-1; rowge t == rowgt t-1
        base = {"_rowlt": "rowle", "_rowge": "rowgt", "_collt": "colle", "_colge": "colgt"}[name]
        return parent.select(_ops[base], thunk - 1)
    return parent.select(_ops[name], thunk)


def row(expr):
    return _positional_select(expr, "row")


def column(expr):
    return _positional_select(expr, "column")


def index(expr):
    return _positional_select(expr, "index")


def __dir__():
    return list(globals().keys())


# scoped 64-bit mode over module entry points (core/utils.py:x64_func):
# the rewriters do eager scalar arithmetic on INT64 thunks
from ..core.utils import x64_func as _x64_func  # noqa: E402

row = _x64_func(row)
column = _x64_func(column)
index = _x64_func(index)
value = _x64_func(value)
