"""Container namespace for Aggregator objects (reference: graphblas/agg/).

ss-only aggregators (argmin, argmax, first, last, first_index, last_index)
live under ``gb.agg.ss`` like the reference.
"""

from ..core.operator.agg import Aggregator, _initialize_builtins as _init


class _SSNamespace:
    """gb.agg.ss — positional/order-dependent aggregators."""


ss = _SSNamespace()

_ops, _ss_ops = _init({})
globals().update(_ops)
for _name, _op in _ss_ops.items():
    setattr(ss, _name, _op)
del _name, _op


def from_string(string):
    from ..core.operator.utils import aggregator_from_string

    return aggregator_from_string(string)


def __dir__():
    return list(globals().keys()) + ["ss"]


def __getattr__(key):
    if key in ("argmin", "argmax", "first", "last", "first_index", "last_index"):
        raise AttributeError(
            f"gb.agg.{key} is available as gb.agg.ss.{key} "
            "(SuiteSparse-extension namespace, kept for API compatibility)"
        )
    raise AttributeError(f"module 'graphblas_tpu.agg' has no attribute {key!r}")
