"""Combined operator namespace: unary | binary | monoid | semiring.

Reference: graphblas/op/__init__.py — monoids take precedence over binary ops
of the same name when both exist?  No: in the reference, ``op.plus`` is the
BinaryOp (binary wins for dual names); semirings resolve by their grammar.
"""


def from_string(string):
    from ..core.operator.utils import op_from_string

    return op_from_string(string)


def __dir__():
    from .. import binary, monoid, semiring, unary

    return sorted(
        set(globals())
        | set(dir(unary))
        | set(dir(binary))
        | set(dir(monoid))
        | set(dir(semiring))
    )


def __getattr__(key):
    if key.startswith("__"):
        raise AttributeError(key)
    from .. import binary, monoid, semiring, unary

    for mod in (unary, binary, monoid):
        try:
            rv = getattr(mod, key)
        except AttributeError:
            continue
        globals()[key] = rv
        return rv
    try:
        rv = getattr(semiring, key)
    except AttributeError:
        raise AttributeError(f"module 'graphblas_tpu.op' has no attribute {key!r}") from None
    globals()[key] = rv
    return rv
