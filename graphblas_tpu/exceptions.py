"""GraphBLAS exception hierarchy.

Mirrors the error classes of the GraphBLAS C API 2.0 as exposed by the
reference implementation (reference: graphblas/exceptions.py:8-155), but
raised directly from Python/JAX — there is no C status code to translate.
"""


class GraphblasException(Exception):
    """Base class for all GraphBLAS exceptions."""


class NoValue(GraphblasException):
    """Attempted to extract an element that is not present."""


class UninitializedObject(GraphblasException):
    """Object has not been initialized."""


class InvalidObject(GraphblasException):
    """One of the collection objects is in an invalid state."""


class NullPointer(GraphblasException):
    """A null pointer was passed."""


class InvalidValue(GraphblasException):
    """An invalid value was passed."""


class InvalidIndex(GraphblasException):
    """An index is out of range for its object (single-element ops)."""


class DomainMismatch(GraphblasException):
    """The domains (dtypes) of operators/collections are incompatible."""


class DimensionMismatch(GraphblasException):
    """Array dimensions are incompatible for the requested operation."""


class OutputNotEmpty(GraphblasException):
    """Attempted to build a collection that already contains values."""


class OutOfMemory(GraphblasException):
    """The engine ran out of memory."""


class InsufficientSpace(GraphblasException):
    """Provided buffers are too small."""


class IndexOutOfBound(GraphblasException):
    """An index is outside the allowed range (may be deferred in nonblocking mode)."""


class Panic(GraphblasException):
    """Unrecoverable internal error."""


class EmptyObject(GraphblasException):
    """An object with no value was used where a value is required (e.g. empty Scalar)."""


class NotImplementedException(GraphblasException):
    """The requested feature is not implemented."""


class UdfParseError(GraphblasException):
    """Failed to trace/compile a user-defined function."""

    # The reference attaches numba parse errors here; we attach JAX trace errors.
