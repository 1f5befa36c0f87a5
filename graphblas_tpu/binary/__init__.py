"""Container namespace for BinaryOp objects (reference: graphblas/binary/).

Includes the Python-side UDF binaries (absfirst, binom, floordiv, isclose,
...; reference binary/__init__.py:14-22).  Positional ops (firsti, ...) live
under ``gb.binary.ss``.
"""

from ..core.operator import SS_BINARY_NAMES as _SS_NAMES
from ..core.operator.binary import BinaryOp as _BinaryOp
from ..core.operator.binary import _initialize_builtins as _init

register_new = _BinaryOp.register_new
register_anonymous = _BinaryOp.register_anonymous


class _SSNamespace:
    """gb.binary.ss — relocated positional binary ops + engine-JIT
    registration (reference core/ss/binary.py:33)."""

    @staticmethod
    def register_new(name, jit_definition, left_type=None, right_type=None,
                     ret_type=None):
        from ..core.ss.jit import register_new_binary

        return register_new_binary(name, jit_definition, left_type,
                                   right_type, ret_type)


ss = _SSNamespace()

_ops = _init({})
for _name, _op in _ops.items():
    if _name in _SS_NAMES:
        setattr(ss, _name, _op)
    else:
        globals()[_name] = _op
del _name, _op


def from_string(string):
    from ..core.operator.utils import binary_from_string

    return binary_from_string(string)


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
            f"gb.binary.{key} is available as gb.binary.ss.{key} "
            "(SuiteSparse-extension namespace, kept for API compatibility)"
        )
    raise AttributeError(f"module 'graphblas_tpu.binary' has no attribute {key!r}")
