"""Container namespace for IndexUnaryOp objects (reference: graphblas/indexunary/)."""

from ..core.operator.indexunary import IndexUnaryOp as _IndexUnaryOp
from ..core.operator.indexunary import _initialize_builtins as _init

register_new = _IndexUnaryOp.register_new
register_anonymous = _IndexUnaryOp.register_anonymous

_ops = _init({})
globals().update(_ops)
# aliases (reference indexunary.py:389-390)
indexle = _ops["rowle"]
indexgt = _ops["rowgt"]


def from_string(string):
    from ..core.operator.utils import indexunary_from_string

    return indexunary_from_string(string)


class _SSNamespace:
    """gb.indexunary.ss — engine-JIT registration
    (reference indexunary/ss.py, core/ss/indexunary.py:27)."""

    @staticmethod
    def register_new(name, jit_definition, input_type=None, thunk_type=None,
                     ret_type=None):
        from ..core.ss.jit import register_new_indexunary

        return register_new_indexunary(name, jit_definition, input_type,
                                       thunk_type, ret_type)


ss = _SSNamespace()


def __dir__():
    return list(globals().keys())


def __getattr__(key):
    raise AttributeError(f"module 'graphblas_tpu.indexunary' has no attribute {key!r}")
