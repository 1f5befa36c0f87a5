"""numpy Semiring family (reference graphblas/semiring/numpy.py: the filtered
monoid x binary cartesian product, :19-60).  Built lazily by name:
``semiring.numpy.add_multiply`` etc."""

from ..core.config import config as _config

_monoid_names = {
    "add", "multiply", "logaddexp", "logaddexp2", "gcd", "hypot",
    "bitwise_and", "bitwise_or", "bitwise_xor", "equal", "logical_and",
    "logical_or", "logical_xor", "maximum", "minimum", "fmax", "fmin",
}


def __dir__():
    return sorted(set(globals()))


def __getattr__(name):
    from .. import binary as _binary_ns
    from .. import monoid as _monoid_ns
    from ..core.operator.utils import get_semiring

    for mono_name in sorted(_monoid_names, key=len, reverse=True):
        if name.startswith(mono_name + "_"):
            mult_name = name[len(mono_name) + 1 :]
            try:
                mono = getattr(_monoid_ns.numpy, mono_name)
                mult = getattr(_binary_ns.numpy, mult_name)
            except AttributeError:
                continue
            ring = get_semiring(mono, mult, f"numpy.{name}")
            globals()[name] = ring
            return ring
    raise AttributeError(f"module 'graphblas_tpu.semiring.numpy' has no attribute {name!r}")
