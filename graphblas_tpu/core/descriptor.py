"""Descriptor: bundles (replace, mask_complement, mask_structure, tran0, tran1).

The reference maps these to the 32 prebuilt GrB_DESC_* C descriptors
(core/descriptor.py:8-156).  Our engine consumes the flags directly as static
jit arguments, so Descriptor is a plain record; `lookup` is kept for parity.
"""

__all__ = ["Descriptor", "lookup"]


class Descriptor:
    __slots__ = (
        "replace",
        "mask_complement",
        "mask_structure",
        "transpose_first",
        "transpose_second",
        "opts",
        "name",
        "__weakref__",
    )

    def __init__(
        self,
        *,
        replace=False,
        mask_complement=False,
        mask_structure=False,
        transpose_first=False,
        transpose_second=False,
        name=None,
        **opts,
    ):
        self.replace = replace
        self.mask_complement = mask_complement
        self.mask_structure = mask_structure
        self.transpose_first = transpose_first
        self.transpose_second = transpose_second
        self.opts = opts
        self.name = name or self._build_name()

    def _build_name(self):
        parts = []
        if self.replace:
            parts.append("R")
        if self.mask_structure:
            parts.append("S")
        if self.mask_complement:
            parts.append("C")
        if self.transpose_first:
            parts.append("T0")
        if self.transpose_second:
            parts.append("T1")
        return "desc." + ("".join(parts) if parts else "NULL")

    def __repr__(self):
        return self.name


_cache = {}


def lookup(replace=False, mask_complement=False, mask_structure=False,
           transpose_first=False, transpose_second=False, **opts):
    if opts:
        return Descriptor(
            replace=replace,
            mask_complement=mask_complement,
            mask_structure=mask_structure,
            transpose_first=transpose_first,
            transpose_second=transpose_second,
            **opts,
        )
    key = (replace, mask_complement, mask_structure, transpose_first, transpose_second)
    if key not in _cache:
        _cache[key] = Descriptor(
            replace=replace,
            mask_complement=mask_complement,
            mask_structure=mask_structure,
            transpose_first=transpose_first,
            transpose_second=transpose_second,
        )
    return _cache[key]
