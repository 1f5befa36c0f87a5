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


def __dir__():
    return list(globals().keys())


def __getattr__(key):
    raise AttributeError(f"module 'graphblas_tpu.indexunary' has no attribute {key!r}")
