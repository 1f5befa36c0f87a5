"""Public dtype namespace: re-exports core.dtypes (reference: graphblas.dtypes)."""

from .core.dtypes import *  # noqa: F401,F403
from .core.dtypes import (  # noqa: F401
    _INDEX,
    DataType,
    lookup_dtype,
    register_anonymous,
    register_new,
    ss,
    unify,
)
