"""Small shared utilities (reference: graphblas/core/utils.py)."""

import types

import numpy as np

from .dtypes import lookup_dtype

_output_types = {}


def output_type(val):
    """Return the canonical collection class for a value (expressions map to
    their output collection type).  Reference core/utils.py:49."""
    ot = getattr(val, "output_type", None)
    if isinstance(ot, type):
        return ot
    try:
        return _output_types[type(val)]
    except KeyError:
        return type(val)


def wrapdoc(func_with_doc):
    def inner(func_wo_doc):
        func_wo_doc.__doc__ = func_with_doc.__doc__
        return func_wo_doc

    return inner


def ints_to_numpy_buffer(array, dtype, *, name="array", copy=False, ownable=False, order="C"):
    if (
        isinstance(array, np.ndarray)
        and not np.issubdtype(array.dtype, np.integer)
        and not np.issubdtype(array.dtype, np.bool_)
    ):
        raise ValueError(f"{name} must be integers, not {array.dtype.name}")
    array = np.array(array, dtype, copy=copy or None, order=order)
    if array.ndim > 1:
        raise ValueError(f"{name} must be 1-dimensional")
    return array


def values_to_numpy_buffer(array, dtype=None, *, copy=False, subarray_after=None, order="C"):
    """Coerce values to a numpy buffer + DataType (reference core/utils.py:56)."""
    if dtype is not None:
        dtype = lookup_dtype(dtype)
        nt = dtype.np_type
        if nt.subdtype is not None:
            # subarray dtype: values come as (n, *subshape) of the base dtype
            # (np.array(values, subarray_dtype) would broadcast wrongly)
            array = np.asarray(array, nt.subdtype[0].base, order=order)
            sub = nt.subdtype[1]
            if array.shape[-len(sub):] != sub:
                raise ValueError(
                    f"values trailing shape {array.shape} does not match "
                    f"subarray dtype shape {sub}"
                )
        else:
            array = np.array(array, nt, copy=copy or None, order=order)
    else:
        is_scalar = np.isscalar(array)
        array = np.array(array, copy=copy or None, order=order)
        if array.dtype.hasobject:
            raise ValueError("object dtype for values is not allowed")
        if is_scalar and array.dtype == np.int32:
            array = array.astype(np.int64)
        if array.dtype == np.float16:
            array = array.astype(np.float32)
        dtype = lookup_dtype(array.dtype)
    return array, dtype


def _np_dtype_for(dtype):
    """numpy dtype used for host buffers of this DataType."""
    return dtype.np_type


def normalize_chunks(chunks, shape):
    """Normalize a chunk specification against a shape (for ss.split).

    Accepts int, list of ints (with None meaning full dim), or nested per-dim
    specifications.  Returns list (per dim) of lists of chunk sizes.
    Reference: core/utils.py:172.
    """
    if isinstance(chunks, (list, tuple)) and len(chunks) == len(shape) and any(
        isinstance(c, (list, tuple)) or c is None for c in chunks
    ):
        chunkspec = chunks
    elif len(shape) == 2 and isinstance(chunks, (list, tuple)) and len(chunks) == 2:
        chunkspec = chunks
    else:
        chunkspec = [chunks] * len(shape)
    out = []
    for spec, dim in zip(chunkspec, shape):
        if spec is None:
            out.append([dim])
        elif isinstance(spec, (int, np.integer)):
            n_full, rem = divmod(dim, int(spec))
            sizes = [int(spec)] * n_full
            if rem:
                sizes.append(rem)
            if not sizes:
                sizes = [0]
            out.append(sizes)
        elif isinstance(spec, (list, tuple)):
            sizes = []
            none_idx = None
            total = 0
            for i, s in enumerate(spec):
                if s is None:
                    if none_idx is not None:
                        raise TypeError("Bad chunk spec: only one None allowed per dimension")
                    none_idx = i
                    sizes.append(None)
                else:
                    s = int(s)
                    if s < 0:
                        raise ValueError(f"Chunk size must be non-negative; got {s}")
                    sizes.append(s)
                    total += s
            if none_idx is not None:
                if total > dim:
                    raise ValueError(f"Chunks are too large; {total} > {dim}")
                sizes[none_idx] = dim - total
            elif total != dim:
                raise ValueError(f"Chunks do not add up to dimension size: {total} != {dim}")
            out.append(sizes)
        else:
            raise TypeError(f"Bad type for chunks: {type(spec)}")
    return out


def get_order(order):
    val = {"c", "row", "rows", "rowwise", "f", "col", "cols", "column", "columns",
           "columnwise"}.intersection([str(order).lower()])
    if not val:
        raise ValueError(
            f'order argument should be "rowwise" or "columnwise"; got {order!r}'
        )
    o = val.pop()
    return "rowwise" if o in ("c", "row", "rows", "rowwise") else "columnwise"


def class_property(cls_attr, instance_getter):
    """Descriptor: class access -> cls_attr, instance access -> getter."""

    class _CP:
        def __get__(self, obj, objtype=None):
            if obj is None:
                return cls_attr
            return instance_getter(obj)

    return _CP()


# --------------------------------------------------------------------- #
# scoped 64-bit mode (see core/__init__.py:x64).  The global
# ``jax_enable_x64`` config is never flipped; instead every library entry
# point that touches device arrays runs inside jax.enable_x64(True) so
# INT64/UINT64/FP64/FC64 (the GraphBLAS default dtypes) survive exactly.
_x64_depth = __import__("threading").local()


def x64_func(fn):
    """Wrap a function so its body runs in the 64-bit-preserving scope.

    Nested wrapped calls skip re-entering the (not-free) config context:
    a public dispatch crosses ~20 wrapped methods, and the context
    enter/exit pairs were measurable on the dispatch hot path."""
    import functools

    import jax

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if getattr(_x64_depth, "d", 0):
            return fn(*args, **kwargs)
        _x64_depth.d = 1
        try:
            with jax.enable_x64(True):
                return fn(*args, **kwargs)
        finally:
            _x64_depth.d = 0

    return wrapper


_X64_SKIP = {
    "__class__", "__new__", "__init_subclass__", "__subclasshook__",
    "__getattribute__", "__setattr__", "__delattr__", "__dir__",
    "__reduce__", "__reduce_ex__", "__sizeof__", "__slots__",
}


def x64_methods(cls):
    """Class decorator: run every method (incl. properties, class/static
    methods and dunders) inside the 64-bit-preserving scope.

    This is the library's API boundary for scoped x64: without the global
    flag, any eager jnp op (or jit call) on an existing 64-bit array would
    silently truncate it to 32 bits, so the scope must cover every public
    method that can touch device arrays."""
    for name, attr in list(vars(cls).items()):
        if name in _X64_SKIP:
            continue
        if isinstance(attr, property):
            setattr(cls, name, property(
                x64_func(attr.fget) if attr.fget else None,
                x64_func(attr.fset) if attr.fset else None,
                x64_func(attr.fdel) if attr.fdel else None,
                attr.__doc__,
            ))
        elif isinstance(attr, staticmethod):
            setattr(cls, name, staticmethod(x64_func(attr.__func__)))
        elif isinstance(attr, classmethod):
            setattr(cls, name, classmethod(x64_func(attr.__func__)))
        elif isinstance(attr, types.FunctionType):
            # plain functions only: a class attribute that happens to be
            # callable (e.g. ``output_type = Matrix``) must stay identical
            setattr(cls, name, x64_func(attr))
    return cls
