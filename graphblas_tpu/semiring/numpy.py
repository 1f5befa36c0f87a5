"""numpy Semiring family (reference graphblas/semiring/numpy.py: the filtered
monoid x binary cartesian product, :19-60).  Built lazily by name:
``semiring.numpy.add_multiply`` etc."""

from ..core.config import config as _config

_monoid_names = {
    "add", "multiply", "logaddexp", "logaddexp2", "gcd", "hypot",
    "bitwise_and", "bitwise_or", "bitwise_xor", "equal", "logical_and",
    "logical_or", "logical_xor", "maximum", "minimum", "fmax", "fmin",
}


def _all_names():
    """Full name set: monoid x binary product minus invalid dtype combos
    (reference graphblas/semiring/numpy.py:19-97 removes the same
    incompatible families by name, so dir() is complete without building
    any operator)."""
    import itertools

    from ..binary.numpy import _binary_names as binary_names
    names = {
        f"{mo}_{mu}"
        for mo, mu in itertools.product(_monoid_names, binary_names)
    }
    names -= {
        f"{mo}_{mu}"
        for mo, mu in itertools.product(
            {"equal", "hypot", "logaddexp", "logaddexp2"},
            {"gcd", "lcm", "left_shift", "right_shift"},
        )
    }
    names -= {
        f"{mo}_{mu}"
        for mo, mu in itertools.product(
            {"bitwise_and", "bitwise_or", "bitwise_xor", "equal", "gcd"},
            {"arctan2", "copysign", "divide", "float_power", "hypot", "ldexp",
             "logaddexp2", "logaddexp", "nextafter", "true_divide"},
        )
    }
    names -= {
        f"{mo}_{mu}"
        for mo, mu in itertools.product(
            {"hypot", "logaddexp", "logaddexp2"},
            {"bitwise_and", "bitwise_or", "bitwise_xor"},
        )
    }
    names -= {
        f"{mo}_{mu}"
        for mo, mu in itertools.product(
            {"equal"},
            {"floor_divide", "fmod", "mod", "power", "remainder", "subtract"},
        )
    }
    return names


def __dir__():
    return sorted(set(globals()) | _all_names())


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
