"""numpy-ufunc UnaryOp family (reference graphblas/unary/numpy.py: ~60 names).

Each op applies the numpy/jnp ufunc semantics.  When ``gb.config['mapnumpy']``
is True and the ufunc matches a builtin GraphBLAS op exactly, the builtin is
aliased instead (reference graphblas.yaml mapnumpy).  Ops build lazily on
attribute access; domains are discovered by tracing each dtype.
"""

import jax.numpy as jnp
import numpy as np

from ..core.config import config as _config
from ..core.operator.unary import UnaryOp as _UnaryOp

_unary_names = {
    "negative", "abs", "absolute", "cbrt", "fabs", "rint", "sign", "exp",
    "exp2", "log", "log2", "log10", "expm1", "log1p", "positive", "sqrt",
    "square", "reciprocal",
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "sinh", "cosh", "tanh",
    "arcsinh", "arccosh", "arctanh", "deg2rad", "rad2deg", "degrees", "radians",
    "bitwise_not", "invert", "logical_not",
    "isfinite", "isinf", "isnan", "signbit", "floor", "ceil", "trunc",
    "spacing",
}

_numpy_to_graphblas = {
    "abs": "abs", "absolute": "abs", "arccos": "acos", "arccosh": "acosh",
    "arcsin": "asin", "arcsinh": "asinh", "arctan": "atan", "arctanh": "atanh",
    "bitwise_not": "bnot", "cbrt": "cbrt", "ceil": "ceil", "cos": "cos",
    "cosh": "cosh", "exp": "exp", "exp2": "exp2", "expm1": "expm1",
    "floor": "floor", "invert": "bnot", "isfinite": "isfinite",
    "isinf": "isinf", "isnan": "isnan", "log": "log", "log10": "log10",
    "log1p": "log1p", "log2": "log2", "negative": "ainv", "positive": "identity",
    "reciprocal": "minv", "sign": "signum", "sin": "sin", "sinh": "sinh",
    "sqrt": "sqrt", "tan": "tan", "tanh": "tanh", "trunc": "trunc",
}

__all__ = sorted(_unary_names)


def _jnp_func(name):
    fn = getattr(jnp, name, None)
    if fn is None:
        fn = {"degrees": jnp.rad2deg, "radians": jnp.deg2rad}.get(name)
    return fn


def __dir__():
    return sorted(set(globals()) | _unary_names)


def __getattr__(name):
    if name not in _unary_names:
        raise AttributeError(f"module 'graphblas_tpu.unary.numpy' has no attribute {name!r}")
    if _config.get("mapnumpy") and name in _numpy_to_graphblas:
        from .. import unary as _unary_ns
        from ..core.operator import SS_UNARY_NAMES

        target = _numpy_to_graphblas[name]
        if target in SS_UNARY_NAMES:
            rv = getattr(_unary_ns.ss, target)
        else:
            rv = getattr(_unary_ns, target)
        globals()[name] = rv
        return rv
    fn = _jnp_func(name)
    if fn is None:
        raise AttributeError(f"numpy unary {name!r} is unavailable")
    op = _UnaryOp.register_anonymous(fn, f"numpy.{name}")
    op._anonymous = False
    globals()[name] = op
    return op
