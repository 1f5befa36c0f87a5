"""Per-call descriptor options (reference core/ss/descriptor.py:123-197).

Every public operation accepts ``**opts`` that flow through
``Updater.opts`` (SURVEY §5, config tier 3).  On the TPU backend they are
execution *hints*: XLA owns threading and scheduling, so ``nthreads`` and
``chunk`` are validated no-ops; ``axb_method`` is accepted as an mxm
strategy hint; ``sort``/``secure_import`` are accepted for interchange
parity; ``compression``/``compression_level`` flow to ``ss.serialize``.
Unknown options or invalid values raise ValueError, matching the
reference's behavior for its suitesparse backend.
"""

__all__ = ["validate_opts"]

_AXB_METHODS = {"gustavson", "dot", "hash", "saxpy", "default"}
_COMPRESSIONS = {"none", "default", "lz4", "lz4hc", "zstd"}
_VALID = {
    "nthreads", "chunk", "axb_method", "sort", "secure_import",
    "compression", "compression_level",
}


def validate_opts(opts):
    """Validate per-call descriptor opts; returns the dict unchanged."""
    if not opts:
        return opts
    for key, val in opts.items():
        if key not in _VALID:
            raise ValueError(
                f"Descriptor option {key!r} not understood with tpu backend. "
                f"Valid options: {', '.join(sorted(_VALID))}"
            )
        if val is None or val is False:
            continue
        if key == "axb_method":
            if not isinstance(val, str) or val.lower() not in _AXB_METHODS:
                raise ValueError(
                    f"Invalid value for 'axb_method' descriptor option: {val!r}. "
                    f"Must be one of {', '.join(repr(x) for x in sorted(_AXB_METHODS))}"
                )
        elif key == "compression":
            if not isinstance(val, str) or val.lower() not in _COMPRESSIONS:
                raise ValueError(
                    f"Invalid value for 'compression' descriptor option: {val!r}. "
                    f"Must be one of {', '.join(repr(x) for x in sorted(_COMPRESSIONS))}"
                )
        elif key in ("nthreads", "compression_level"):
            if not isinstance(val, (int, float)):
                raise ValueError(
                    f"Invalid value for {key!r} descriptor option: {val!r}"
                )
        elif key == "chunk":
            if not isinstance(val, (int, float)):
                raise ValueError(
                    f"Invalid value for 'chunk' descriptor option: {val!r}"
                )
        elif key in ("sort", "secure_import"):
            if not isinstance(val, (bool, int)):
                raise ValueError(
                    f"Invalid value for {key!r} descriptor option: {val!r}"
                )
    return opts
