"""Dtype system: numpy <-> GraphBLAS <-> JAX type triangle.

Capability parity with reference graphblas/core/dtypes.py (DataType:16,
register_new:76, register_anonymous:87, lookup_dtype:352, unify:377), designed
for JAX: every builtin dtype maps to a JAX-supported numpy dtype
(INT64/UINT64/FP64/FC64 stay exact via the scoped x64 boundary,
core/utils.py:x64_methods — the global JAX config is never touched).

UDTs (user-defined types) are any numpy struct or subarray dtype.  On device a
UDT value is a pytree: subarray dtypes become trailing array dimensions;
struct dtypes become dicts of field arrays.  See core/engine/store.py.
"""

import numpy as np

from ..exceptions import GraphblasException

__all__ = [
    "DataType",
    "BOOL",
    "INT8",
    "INT16",
    "INT32",
    "INT64",
    "UINT8",
    "UINT16",
    "UINT32",
    "UINT64",
    "FP32",
    "FP64",
    "FC32",
    "FC64",
    "lookup_dtype",
    "unify",
    "register_new",
    "register_anonymous",
    "ss",
]

_supports_complex = True


class DataType:
    __slots__ = "name", "gb_name", "np_type", "_is_udt", "__weakref__"

    def __init__(self, name, gb_name, np_type, *, is_udt=False):
        self.name = name
        self.gb_name = gb_name
        self.np_type = np.dtype(np_type)
        self._is_udt = is_udt

    def __repr__(self):
        return self.name

    def __eq__(self, other):
        if type(other) is DataType:
            return self.np_type == other.np_type
        try:
            other = lookup_dtype(other)
        except ValueError:
            raise TypeError(f"Invalid or unknown datatype: {other}") from None
        return self.np_type == other.np_type

    def __ne__(self, other):
        return not self.__eq__(other)

    def __hash__(self):
        return hash(self.np_type)

    def __lt__(self, other):
        # Arbitrary but stable ordering (used for sorting op type tables)
        t = lookup_dtype(other)
        return (self.np_type.kind, self.np_type.itemsize, self.name) < (
            t.np_type.kind,
            t.np_type.itemsize,
            t.name,
        )

    def __reduce__(self):
        if self._is_udt:
            return (_deserialize_udt, (_dtype_to_string(self.np_type), self.name))
        return self.name

    @property
    def _carg(self):  # compat shim: reference exposes the C object here
        return self.name

    @property
    def is_signed_int(self):
        return self.np_type.kind == "i"

    @property
    def is_unsigned_int(self):
        return self.np_type.kind == "u"

    @property
    def is_int(self):
        return self.np_type.kind in "iu"

    @property
    def is_float(self):
        return self.np_type.kind == "f"

    @property
    def is_complex(self):
        return self.np_type.kind == "c"

    @property
    def is_bool(self):
        return self.np_type.kind == "b"


BOOL = DataType("BOOL", "GrB_BOOL", np.bool_)
INT8 = DataType("INT8", "GrB_INT8", np.int8)
INT16 = DataType("INT16", "GrB_INT16", np.int16)
INT32 = DataType("INT32", "GrB_INT32", np.int32)
INT64 = DataType("INT64", "GrB_INT64", np.int64)
UINT8 = DataType("UINT8", "GrB_UINT8", np.uint8)
UINT16 = DataType("UINT16", "GrB_UINT16", np.uint16)
UINT32 = DataType("UINT32", "GrB_UINT32", np.uint32)
UINT64 = DataType("UINT64", "GrB_UINT64", np.uint64)
FP32 = DataType("FP32", "GrB_FP32", np.float32)
FP64 = DataType("FP64", "GrB_FP64", np.float64)
FC32 = DataType("FC32", "GxB_FC32", np.complex64)
FC64 = DataType("FC64", "GxB_FC64", np.complex128)

# GrB_Index is UINT64 in the spec; INT64 is friendlier to XLA (gather/scatter
# index dtype), so the internal index type is int64 while the *visible* dtype
# of index-producing ops remains UINT64/INT64 per the spec tables.
_INDEX = DataType("INDEX", "GrB_Index", np.uint64)

_BUILTIN = [BOOL, INT8, INT16, INT32, INT64, UINT8, UINT16, UINT32, UINT64, FP32, FP64]
_COMPLEX = [FC32, FC64]
_ALL_BUILTIN = _BUILTIN + _COMPLEX

_registry = {}


def _register_builtin(dtype):
    _registry[dtype.name] = dtype
    _registry[dtype.name.lower()] = dtype
    _registry[dtype.gb_name] = dtype
    _registry[dtype.np_type] = dtype
    _registry[dtype.np_type.name] = dtype
    _registry[dtype.np_type.str] = dtype
    _registry[np.dtype(dtype.np_type).type] = dtype


for _d in _ALL_BUILTIN:
    _register_builtin(_d)
del _d

_registry[bool] = BOOL
_registry[int] = INT64
_registry[float] = FP64
_registry["bool"] = BOOL
_registry["int"] = INT64
_registry["float"] = FP64
_registry[complex] = FC64
_registry["complex"] = FC64


def register_new(name, dtype):
    """Register a new UDT under ``gb.dtypes.<name>``.

    ``dtype`` may be any numpy struct or subarray dtype (or something
    np.dtype() accepts).  Reference: core/dtypes.py:76.
    """
    if not name.isidentifier():
        raise ValueError(f"`name` argument must be a valid Python identifier; got: {name!r}")
    if name in _registry or name in globals():
        raise ValueError(f"{name!r} name for dtype is unavailable")
    rv = register_anonymous(dtype, name)
    _registry[name] = rv
    globals()[name] = rv
    return rv


def register_anonymous(dtype, name=None):
    dtype = np.dtype(dtype)
    if dtype in _registry:
        existing = _registry[dtype]
        if name is None or existing.name == name:
            return existing
    if dtype.hasobject:
        raise ValueError("dtype must not contain Python objects")
    if dtype.names is None and dtype.subdtype is None and name is None:
        # Plain scalar dtype that isn't a builtin (e.g. float16): disallow like ref
        raise ValueError(f"dtype must be a struct or subarray dtype; got {dtype}")
    rv = DataType(name if name is not None else _default_name(dtype), None, dtype, is_udt=True)
    _registry[dtype] = rv
    if name is not None:
        pass  # only register_new makes it globally visible by name
    return rv


def _default_name(dtype):
    dtype = np.dtype(dtype)
    if dtype in _registry and not _registry[dtype]._is_udt:
        return _registry[dtype].name
    if dtype.subdtype is not None:
        sub = _default_name(dtype.subdtype[0])
        shape = ", ".join(map(str, dtype.subdtype[1]))
        return f"{sub}[{shape}]"
    if dtype.names:
        args = ", ".join(f"{n!r}: {_default_name(dtype.fields[n][0])}" for n in dtype.names)
        return f"{{{args}}}"
    return repr(dtype)


def _dtype_to_string(dtype):
    """String that can be round-tripped with _string_to_dtype (for serialization)."""
    if isinstance(dtype, np.dtype) and dtype not in _registry:
        np_type = dtype
    else:
        dt = lookup_dtype(dtype)
        if not dt._is_udt:
            return dt.name
        np_type = dt.np_type
    s = str(np_type)
    try:
        # ast.literal_eval: np.lib.format.safe_eval was removed from numpy
        import ast

        if np.dtype(ast.literal_eval(s)) == np_type:
            return s
    except Exception:
        pass
    if np.dtype(np_type.str) != np_type:
        raise ValueError(f"Unable to reliably convert dtype to string and back: {dtype}")
    return repr(np_type.str)


def _safe_eval_dtype(s):
    """Parse a dtype literal string (ast.literal_eval: numpy removed
    np.lib.format.safe_eval)."""
    import ast

    return np.dtype(ast.literal_eval(s))


def _string_to_dtype(s):
    try:
        return lookup_dtype(s)
    except Exception:
        pass
    return lookup_dtype(_safe_eval_dtype(s))


def _deserialize_udt(s, name):
    np_type = _safe_eval_dtype(s) if s not in _registry else np.dtype(s)
    if np_type in _registry:
        return _registry[np_type]
    return register_anonymous(np_type, name)


def lookup_dtype(key, value=None):
    """Resolve anything dtype-like to a DataType. Reference: core/dtypes.py:352."""
    if type(key) is DataType:
        return key
    try:
        return _registry[key]
    except (KeyError, TypeError):
        pass
    if value is not None and hasattr(value, "dtype"):
        try:
            return _registry[value.dtype]
        except (KeyError, TypeError):
            pass
    if key is None:
        raise TypeError("Bad dtype: None.  A valid dtype must be provided.")
    if isinstance(key, dict):
        # {'x': int, 'y': float} -> record dtype (reference dtypes.py:352,
        # tests/test_dtype.py:219)
        np_rec = np.dtype(
            [(name, lookup_dtype(field).np_type) for name, field in key.items()],
            align=True,
        )
        return lookup_dtype(np_rec)
    try:
        return register_anonymous(key)
    except Exception:
        pass
    raise ValueError(f"Unknown dtype: {key} of type {type(key)}")


def unify(type1, type2, *, is_left_scalar=False, is_right_scalar=False):
    """Return a dtype that can hold both type1 and type2.

    Matches the reference's numpy-based promotion, including the
    scalar-vs-collection asymmetry (reference: core/dtypes.py:377).
    """
    if type1 is type2:
        return type1
    if type1._is_udt or type2._is_udt:
        if type1 == type2:
            return type1
        raise TypeError(f"Cannot unify UDTs {type1} and {type2}")
    if is_left_scalar:
        if not is_right_scalar:
            return lookup_dtype(np.result_type(np.array(0, type1.np_type), type2.np_type))
    elif is_right_scalar:
        return lookup_dtype(np.result_type(type1.np_type, np.array(0, type2.np_type)))
    return lookup_dtype(np.promote_types(type1.np_type, type2.np_type))


_C_TO_NP = {
    "bool": "?", "_Bool": "?",
    "int8_t": "i1", "char": "i1", "signed char": "i1",
    "uint8_t": "u1", "unsigned char": "u1",
    "int16_t": "i2", "short": "i2",
    "uint16_t": "u2", "unsigned short": "u2",
    "int32_t": "i4", "int": "i4",
    "uint32_t": "u4", "unsigned int": "u4", "unsigned": "u4",
    "int64_t": "i8", "long": "i8", "long long": "i8",
    "uint64_t": "u8", "unsigned long": "u8", "unsigned long long": "u8",
    "float": "f4", "double": "f8",
    "float complex": "c8", "double complex": "c16",
}


def _parse_c_struct_typedef(name, source):
    """Parse ``typedef struct { double x; int64_t y[4]; } name;`` into a
    numpy struct dtype.  Covers the struct shapes the reference's JIT dtype
    tests use (reference core/ss/dtypes.py:17-88, tests/test_ssjit.py:95-133);
    anything fancier needs an explicit np_type=."""
    import re

    m = re.search(r"typedef\s+struct\s*\{(.*)\}\s*(\w+)\s*;", source, re.S)
    if m is None:
        raise ValueError(
            "Only struct typedefs are currently allowed for JIT dtypes")
    body, tname = m.groups()
    if tname != name:
        raise ValueError(
            "`name` argument must be same name as the typedef in `jit_c_definition`")
    fields = []
    for decl in body.split(";"):
        decl = decl.strip()
        if not decl:
            continue
        fm = re.match(r"(.+?)\s+(\w+)\s*((?:\[\s*\d+\s*\]\s*)*)$", decl)
        if fm is None:
            raise ValueError(f"Cannot parse struct field: {decl!r}")
        ctype, fname, arr = fm.groups()
        ctype = " ".join(ctype.split())
        if ctype not in _C_TO_NP:
            raise ValueError(f"Unsupported C field type: {ctype!r}")
        np_t = _C_TO_NP[ctype]
        dims = tuple(int(d) for d in re.findall(r"\d+", arr or ""))
        fields.append((fname, np_t, dims) if dims else (fname, np_t))
    return np.dtype(fields)


class _DtypeSS:
    """``gb.dtypes.ss`` — engine-JIT dtype registration (reference
    core/ss/dtypes.py:17).  The reference hands a C typedef to the SuiteSparse
    compiler JIT; here the typedef is parsed into the equivalent numpy struct
    dtype and registered as a UDT (or pass ``np_type=`` explicitly)."""

    @staticmethod
    def register_new(name, jit_c_definition, *, np_type=None):
        if not name.isidentifier():
            raise ValueError(
                f"`name` argument must be a valid Python identifier; got: {name!r}")
        if np_type is None:
            np_type = _parse_c_struct_typedef(name, jit_c_definition)
        rv = register_new(name, np_type)
        setattr(_DtypeSS, name, rv)
        return rv


ss = _DtypeSS()
