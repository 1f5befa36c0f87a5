"""Container namespace for UnaryOp objects (reference: graphblas/unary/).

``gb.unary.abs``, ``gb.unary.sqrt``, ... SuiteSparse-specific names live under
``gb.unary.ss`` for API compatibility (erf, positioni, ...); the numpy-ufunc
family is at ``gb.unary.numpy``.
"""

from ..core.operator import SS_UNARY_NAMES as _SS_NAMES
from ..core.operator.unary import UnaryOp as _UnaryOp
from ..core.operator.unary import _initialize_builtins as _init

register_new = _UnaryOp.register_new
register_anonymous = _UnaryOp.register_anonymous


class _SSNamespace:
    """gb.unary.ss — relocated SuiteSparse-extension unary ops + engine-JIT
    registration (reference core/ss/unary.py:27)."""

    @staticmethod
    def register_new(name, jit_definition, input_type=None, ret_type=None):
        from ..core.ss.jit import register_new_unary

        return register_new_unary(name, jit_definition, input_type, ret_type)


ss = _SSNamespace()

_ops = _init({})
for _name, _op in _ops.items():
    if _name in _SS_NAMES:
        setattr(ss, _name, _op)
    else:
        globals()[_name] = _op
del _name, _op


def from_string(string):
    from ..core.operator.utils import unary_from_string

    return unary_from_string(string)


def __dir__():
    return list(globals().keys()) + ["numpy", "ss"]


def __getattr__(key):
    if key == "numpy":
        import importlib

        numpy_mod = importlib.import_module(".numpy", __name__)
        globals()["numpy"] = numpy_mod
        return numpy_mod
    if key in _SS_NAMES:
        raise AttributeError(
            f"gb.unary.{key} is available as gb.unary.ss.{key} "
            "(SuiteSparse-extension namespace, kept for API compatibility)"
        )
    raise AttributeError(f"module 'graphblas_tpu.unary' has no attribute {key!r}")
