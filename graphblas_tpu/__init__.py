"""graphblas_tpu: a TPU-native GraphBLAS framework built on JAX/XLA/Pallas.

A from-scratch implementation of the GraphBLAS C API 2.0 object model and
operation set — sparse linear algebra over arbitrary semirings for graph
analytics — with the same Python surface as python-graphblas (the reference
at titisda/graph-python), but with the compute engine implemented as fused
JAX/Pallas kernels instead of the SuiteSparse C library.

Public namespace parity target: reference graphblas/__init__.py:41-60.
"""

from .core import _supports_udfs  # noqa: F401  (enables x64 first)
from . import core as _core

__version__ = "0.1.0"

backend = "tpu"


class _ReplaceSingleton:
    """`gb.replace` — pass as a positional arg to C(...) to set replace=True.

    Reference: graphblas/__init__.py:5-19.
    """

    _instance = None

    def __new__(cls):
        if cls._instance is None:
            cls._instance = super().__new__(cls)
        return cls._instance

    def __repr__(self):
        return "replace"

    def __reduce__(self):
        return "replace"


replace = _ReplaceSingleton()

from .core.config import config  # noqa: E402


def init(backend="tpu", blocking=None):
    """Initialize the library (reference __init__.py:105).

    On TPU there is nothing heavyweight to initialize — JAX dispatch is
    inherently non-blocking (async) — but we keep the entry point: `backend`
    must be "tpu" (alias: "jax"), and `blocking=True` makes every operation
    block until device completion (useful for debugging/timing).
    """
    import jax

    if backend not in ("tpu", "jax", "cpu"):
        raise ValueError(f"Bad backend name: {backend!r}.  This package's backend is 'tpu'.")
    if _core._init_params is not None:
        if _core._blocking is not None and blocking is not None and blocking != _core._blocking:
            raise RuntimeError("graphblas_tpu is already initialized with different parameters")
        return
    _core._init_params = {"backend": backend, "blocking": bool(blocking)}
    _core._backend = backend
    _core._blocking = bool(blocking)


from . import dtypes  # noqa: E402
from .exceptions import GraphblasException  # noqa: E402, F401

# operator namespaces
from . import unary, binary, monoid, semiring, indexunary, select, op, agg  # noqa: E402
from .core.operator.coercions import install as _install_coercions  # noqa: E402

_install_coercions()

# collections
from .core.matrix import Matrix  # noqa: E402
from .core.vector import Vector  # noqa: E402
from .core.scalar import Scalar  # noqa: E402
from .core import infix as _infix  # noqa: E402  (installs |, &, @, arithmetic)
from .core.recorder import Recorder  # noqa: E402

from . import io, viz  # noqa: E402
from . import ss  # noqa: E402

__all__ = [
    "Matrix",
    "Vector",
    "Scalar",
    "Recorder",
    "unary",
    "binary",
    "monoid",
    "semiring",
    "indexunary",
    "select",
    "op",
    "agg",
    "dtypes",
    "io",
    "viz",
    "ss",
    "config",
    "init",
    "replace",
    "backend",
]
