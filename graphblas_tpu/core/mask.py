"""Mask system: M.S / M.V / ~M.S / ~M.V (reference core/mask.py:9-516).

The reference implements mask *combination* (`m1 & m2`, `m1 | m2`, Mask.new)
with ~30 pure-GraphBLAS recipes over pair/one/valuene ops; on the bitmap
engine these collapse to boolean algebra over presence arrays, but the public
semantics (which mask kind results from combining which) match the
reference's dispatch tables (_COMBINE_MASKS:271, _COMPLEMENT_MASKS:386,
_MASK_OR:484).
"""

from ..exceptions import GraphblasException


class Mask:
    __slots__ = "parent", "__weakref__"
    complement = False
    structure = False
    value = False

    def __init__(self, mask):
        self.parent = mask

    def __eq__(self, other):
        raise TypeError(f"__eq__ not defined for objects of type {type(self)}.")

    def __bool__(self):
        raise TypeError(f"__bool__ not defined for objects of type {type(self)}.")

    def __repr__(self):
        from .formatting import format_mask

        return format_mask(self)

    def _repr_html_(self):
        from .formatting import format_mask

        return f"<pre>{format_mask(self)}</pre>"

    @property
    def name(self):
        return repr(self)

    @property
    def _name_html(self):
        return repr(self)

    @property
    def dtype(self):
        return self.parent.dtype

    @property
    def shape(self):
        return self.parent.shape

    @property
    def ndim(self):
        return self.parent.ndim

    def _as_array(self):
        """Dense boolean write-permission array (device)."""
        from .engine import dense

        return dense.mask_array(
            self.parent._vals,
            self.parent._valid,
            self.parent.dtype,
            self.structure,
            self.complement,
        )

    def new(self, dtype=None, *, complement=False, mask=None, name=None, **opts):
        """Materialize the mask as a collection of True values.

        Reference: core/mask.py:34.
        """
        from .dtypes import BOOL, lookup_dtype

        if dtype is None:
            dtype = BOOL
        else:
            dtype = lookup_dtype(dtype)
        import jax.numpy as jnp

        arr = self._as_array()
        if mask is not None:
            if not isinstance(mask, Mask):
                raise TypeError("mask argument must be a Mask")
            arr = arr & mask._as_array()
        if complement:
            arr = ~arr
        out = self.parent._new_like(dtype, name=name)
        from .engine import store as st

        vals = st.full_values(arr.shape, dtype, True)
        out._set_store(vals, arr)
        return out

    def __invert__(self):
        return _INVERT[type(self)](self.parent)

    def __and__(self, other):
        return _combine(self, other, "and")

    def __rand__(self, other):
        return _combine(other, self, "and")

    def __or__(self, other):
        return _combine(self, other, "or")

    def __ror__(self, other):
        return _combine(other, self, "or")


class StructuralMask(Mask):
    __slots__ = ()
    complement = False
    structure = True
    value = False


class ValueMask(Mask):
    __slots__ = ()
    complement = False
    structure = False
    value = True


class ComplementedStructuralMask(Mask):
    __slots__ = ()
    complement = True
    structure = True
    value = False


class ComplementedValueMask(Mask):
    __slots__ = ()
    complement = True
    structure = False
    value = True


_INVERT = {
    StructuralMask: ComplementedStructuralMask,
    ComplementedStructuralMask: StructuralMask,
    ValueMask: ComplementedValueMask,
    ComplementedValueMask: ValueMask,
}


def _combine(left, right, how):
    """Combine two masks into a new structural mask over a BOOL collection.

    The reference returns specific mask kinds per pair via recipe tables; the
    observable semantics are those of combining the boolean write-permission
    sets, which is what we compute.  The result is a StructuralMask over a
    BOOL collection of True values (matching the reference's use of pair/one
    iso outputs).
    """
    from .base import BaseType

    if not isinstance(left, Mask) or not isinstance(right, Mask):
        raise TypeError(
            f"Mask must be combined with another mask; got {type(left)} and {type(right)}"
        )
    if left.parent.shape != right.parent.shape:
        from ..exceptions import DimensionMismatch

        raise DimensionMismatch(
            f"Mask shapes do not match: {left.parent.shape} != {right.parent.shape}"
        )
    import jax.numpy as jnp

    from .dtypes import BOOL
    from .engine import store as st

    a = left._as_array()
    b = right._as_array()
    arr = (a & b) if how == "and" else (a | b)
    out = left.parent._new_like(BOOL, name=None)
    vals = st.full_values(arr.shape, BOOL, True)
    out._set_store(vals, arr)
    return StructuralMask(out)


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from .utils import x64_methods as _x64_methods  # noqa: E402
Mask = _x64_methods(Mask)
StructuralMask = _x64_methods(StructuralMask)
ValueMask = _x64_methods(ValueMask)
ComplementedStructuralMask = _x64_methods(ComplementedStructuralMask)
ComplementedValueMask = _x64_methods(ComplementedValueMask)
