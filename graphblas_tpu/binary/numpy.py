"""numpy-ufunc BinaryOp family (reference graphblas/binary/numpy.py: ~45 names)."""

import jax.numpy as jnp
import numpy as np

from ..core.config import config as _config
from ..core.operator.binary import BinaryOp as _BinaryOp

_binary_names = {
    "add", "subtract", "multiply", "divide", "logaddexp", "logaddexp2",
    "true_divide", "floor_divide", "power", "float_power", "remainder", "mod",
    "fmod", "gcd", "lcm",
    "arctan2", "hypot",
    "bitwise_and", "bitwise_or", "bitwise_xor", "left_shift", "right_shift",
    "greater", "greater_equal", "less", "less_equal", "not_equal", "equal",
    "logical_and", "logical_or", "logical_xor", "maximum", "minimum",
    "fmax", "fmin",
    "copysign", "nextafter", "ldexp",
}

_numpy_to_graphblas = {
    "add": "plus",
    "bitwise_and": "band",
    "bitwise_or": "bor",
    "bitwise_xor": "bxor",
    "equal": "eq",
    "fmax": "max",
    "fmin": "min",
    "logical_and": "land",
    "logical_or": "lor",
    "logical_xor": "lxor",
    "multiply": "times",
    "arctan2": "atan2",
    "copysign": "copysign",
    "divide": "truediv",
    "greater": "gt",
    "greater_equal": "ge",
    "hypot": "hypot",
    "ldexp": "ldexp",
    "less": "lt",
    "less_equal": "le",
    "maximum": "max",
    "minimum": "min",
    "not_equal": "ne",
    "power": "pow",
    "subtract": "minus",
    "true_divide": "truediv",
}

__all__ = sorted(_binary_names)


def _jnp_func(name):
    return getattr(jnp, name, None)


def __dir__():
    return sorted(set(globals()) | _binary_names)


def __getattr__(name):
    if name not in _binary_names:
        raise AttributeError(f"module 'graphblas_tpu.binary.numpy' has no attribute {name!r}")
    if _config.get("mapnumpy") and name in _numpy_to_graphblas:
        from .. import binary as _binary_ns

        rv = getattr(_binary_ns, _numpy_to_graphblas[name])
        globals()[name] = rv
        return rv
    fn = _jnp_func(name)
    if fn is None:
        raise AttributeError(f"numpy binary {name!r} is unavailable")
    op = _BinaryOp.register_anonymous(fn, f"numpy.{name}")
    op._anonymous = False
    globals()[name] = op
    return op
