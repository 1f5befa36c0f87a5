"""Container namespace for Semiring objects (reference: graphblas/semiring/).

The ~1400 typed builtin semirings are generated lazily by name on attribute
access: ``semiring.min_plus`` composes ``monoid.min`` with ``binary.plus``
via get_semiring (reference grammar: core/operator/semiring.py:170-205).
Positional semirings (min_firsti, ...) live under ``gb.semiring.ss``.
"""

from ..core.operator.semiring import Semiring as _Semiring
from ..core.operator import POSITIONAL_MULT_NAMES as _POS_MULT

register_new = _Semiring.register_new
register_anonymous = _Semiring.register_anonymous

_MONOID_NAMES = [
    "min", "max", "plus", "times", "any", "lor", "land", "lxor", "lxnor", "eq",
    "band", "bor", "bxor", "bxnor",
]


def _build_by_name(key, *, allow_positional=False):
    from .. import binary as binary_ns
    from .. import monoid as monoid_ns
    from ..core.operator.utils import get_semiring

    if "_" not in key:
        raise AttributeError(key)
    add_name, mult_name = key.split("_", 1)
    if add_name not in _MONOID_NAMES:
        raise AttributeError(key)
    mono = getattr(monoid_ns, add_name, None)
    if mono is None:
        raise AttributeError(key)
    if mult_name == "div":
        mult_name = "cdiv"  # GrB spelling: div IS cdiv (SURVEY Appendix B)
    if mult_name in _POS_MULT:
        if not allow_positional:
            raise AttributeError(
                f"gb.semiring.{key} is available as gb.semiring.ss.{key} "
                "(SuiteSparse-extension namespace, kept for API compatibility)"
            )
        mult = getattr(binary_ns.ss, mult_name)
    else:
        mult = getattr(binary_ns, mult_name, None)
        if mult is None and hasattr(binary_ns, "numpy"):
            mult = getattr(binary_ns.numpy, mult_name, None)
        if mult is None:
            raise AttributeError(key)
    ring = get_semiring(mono, mult, key)
    if not ring.types and not ring.is_positional:
        raise AttributeError(f"No valid dtypes for semiring {key}")
    return ring


class _SSNamespace:
    """gb.semiring.ss — positional semirings (min_firsti, ...)."""

    def __getattr__(self, key):
        ring = _build_by_name(key, allow_positional=True)
        setattr(self, key, ring)
        return ring


ss = _SSNamespace()


def from_string(string):
    from ..core.operator.utils import semiring_from_string

    return semiring_from_string(string)


def get_semiring(monoid, binaryop, name=None):
    from ..core.operator.utils import get_semiring as _gs

    return _gs(monoid, binaryop, name)


_COMMON = [
    "plus_times", "plus_plus", "plus_min", "plus_max", "plus_first", "plus_second",
    "plus_pair", "plus_land", "plus_lor",
    "min_plus", "min_times", "min_first", "min_second", "min_max", "min_min",
    "min_pair", "min_select1st", "min_select2nd",
    "max_plus", "max_times", "max_first", "max_second", "max_min", "max_max",
    "any_pair", "any_first", "any_second", "any_plus", "any_times", "any_min", "any_max",
    "lor_land", "land_lor", "lxor_land", "lxnor_lor", "eq_eq",
    "lor_first", "lor_second", "lor_pair",
    "times_times", "times_plus",
    "band_bor", "bor_band", "bxor_band", "bxnor_band",
    "plus_cdiv", "plus_minus", "plus_rminus",
]


def _grammar_names():
    """The full builtin semiring name grammar (SURVEY Appendix B; reference
    core/operator/semiring.py:170-205): arithmetic-monoid x ring-mult
    product, bool-monoid comparison families, and the bitwise square."""
    arith = ["min", "max", "plus", "times", "any"]
    mults = ["first", "second", "pair", "oneb", "min", "max", "plus", "minus",
             "rminus", "times", "div", "rdiv", "iseq", "isne", "isgt", "islt",
             "isge", "isle", "lor", "land", "lxor"]
    names = {f"{mo}_{mu}" for mo in arith for mu in mults}
    bool_monoids = ["lor", "land", "lxor", "lxnor", "eq", "any"]
    bool_mults = ["eq", "ne", "gt", "lt", "ge", "le", "first", "second",
                  "pair", "oneb", "lor", "land", "lxor"]
    names |= {f"{mo}_{mu}" for mo in bool_monoids for mu in bool_mults}
    bits = ["band", "bor", "bxor", "bxnor"]
    names |= {f"{mo}_{mu}" for mo in bits for mu in bits}
    return names


def __dir__():
    return sorted(
        set(globals())
        | {k for k in _COMMON if "select" not in k}
        | _grammar_names()
        | {"ss", "numpy"}
    )


def __getattr__(key):
    if key == "numpy":
        import importlib

        numpy_mod = importlib.import_module(".numpy", __name__)
        globals()["numpy"] = numpy_mod
        return numpy_mod
    if key.startswith("__"):
        raise AttributeError(key)
    # min_select1st/2nd aliases (SuiteSparse legacy): select1st == first
    lookup = key
    if lookup.endswith("_select1st"):
        lookup = lookup.replace("_select1st", "_first")
    elif lookup.endswith("_select2nd"):
        lookup = lookup.replace("_select2nd", "_second")
    ring = _build_by_name(lookup)
    globals()[key] = ring
    return ring
