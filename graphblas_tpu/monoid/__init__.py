"""Container namespace for Monoid objects (reference: graphblas/monoid/)."""

from .. import binary as _binary_ns
from ..core.operator.monoid import Monoid as _Monoid
from ..core.operator.monoid import _initialize_builtins as _init

register_new = _Monoid.register_new
register_anonymous = _Monoid.register_anonymous

_binary_dict = {
    name: getattr(_binary_ns, name)
    for name in ["min", "max", "plus", "times", "any", "lor", "land", "lxor",
                 "lxnor", "eq", "band", "bor", "bxor", "bxnor"]
}
_ops = _init({}, _binary_dict)
globals().update(_ops)
del _binary_dict


def from_string(string):
    from ..core.operator.utils import monoid_from_string

    return monoid_from_string(string)


def __dir__():
    return list(globals().keys()) + ["numpy"]


def __getattr__(key):
    if key == "numpy":
        import importlib

        numpy_mod = importlib.import_module(".numpy", __name__)
        globals()["numpy"] = numpy_mod
        return numpy_mod
    raise AttributeError(f"module 'graphblas_tpu.monoid' has no attribute {key!r}")
