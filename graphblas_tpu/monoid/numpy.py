"""numpy Monoid family (reference graphblas/monoid/numpy.py: ~15 names with
per-dtype identity tables — identities copied from the reference tables,
monoid/numpy.py:26-90)."""

import numpy as _np

from ..core.config import config as _config
from ..core.operator.monoid import Monoid as _Monoid

_float_dtypes = ["FP32", "FP64"]
_int_dtypes = ["INT8", "INT16", "INT32", "INT64", "UINT8", "UINT16", "UINT32", "UINT64"]
_bool_int_dtypes = ["BOOL", *_int_dtypes]

_monoid_identities = {
    "add": 0,
    "multiply": 1,
    "logaddexp": dict.fromkeys(_float_dtypes, -_np.inf),
    "logaddexp2": dict.fromkeys(_float_dtypes, -_np.inf),
    "gcd": dict.fromkeys(_int_dtypes, 0),
    "hypot": dict.fromkeys(_float_dtypes, 0.0),
    "bitwise_and": {dt: True if dt == "BOOL" else -1 for dt in _bool_int_dtypes},
    "bitwise_or": dict.fromkeys(_bool_int_dtypes, 0),
    "bitwise_xor": dict.fromkeys(_bool_int_dtypes, 0),
    "equal": {"BOOL": True},
    "logical_and": {"BOOL": True},
    "logical_or": {"BOOL": True},
    "logical_xor": {"BOOL": False},
    "maximum": {
        "BOOL": False,
        "INT8": _np.iinfo(_np.int8).min, "UINT8": 0,
        "INT16": _np.iinfo(_np.int16).min, "UINT16": 0,
        "INT32": _np.iinfo(_np.int32).min, "UINT32": 0,
        "INT64": _np.iinfo(_np.int64).min, "UINT64": 0,
        "FP32": -_np.inf, "FP64": -_np.inf,
    },
    "minimum": {
        "BOOL": True,
        "INT8": _np.iinfo(_np.int8).max, "UINT8": _np.iinfo(_np.uint8).max,
        "INT16": _np.iinfo(_np.int16).max, "UINT16": _np.iinfo(_np.uint16).max,
        "INT32": _np.iinfo(_np.int32).max, "UINT32": _np.iinfo(_np.uint32).max,
        "INT64": _np.iinfo(_np.int64).max, "UINT64": _np.iinfo(_np.uint64).max,
        "FP32": _np.inf, "FP64": _np.inf,
    },
    "fmax": {"FP32": -_np.inf, "FP64": -_np.inf},
    "fmin": {"FP32": _np.inf, "FP64": _np.inf},
}

_numpy_to_graphblas = {
    "add": "plus",
    "multiply": "times",
    "bitwise_and": "band",
    "bitwise_or": "bor",
    "bitwise_xor": "bxor",
    "equal": "eq",
    "logical_and": "land",
    "logical_or": "lor",
    "logical_xor": "lxor",
    "maximum": "max",
    "minimum": "min",
    "fmax": "max",
    "fmin": "min",
}

__all__ = sorted(_monoid_identities)


def __dir__():
    return sorted(set(globals()) | set(_monoid_identities))


def __getattr__(name):
    if name not in _monoid_identities:
        raise AttributeError(f"module 'graphblas_tpu.monoid.numpy' has no attribute {name!r}")
    if _config.get("mapnumpy") and name in _numpy_to_graphblas:
        from .. import monoid as _monoid_ns

        rv = getattr(_monoid_ns, _numpy_to_graphblas[name])
        globals()[name] = rv
        return rv
    from .. import binary as _binary_ns

    binop = getattr(_binary_ns.numpy, name)
    mono = _Monoid.register_anonymous(binop, _monoid_identities[name], f"numpy.{name}")
    mono._anonymous = False
    globals()[name] = mono
    return mono
