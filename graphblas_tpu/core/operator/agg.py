"""Aggregators: reductions beyond monoids (reference core/operator/agg.py).

The reference implements these as multi-step recipes over semirings with
dense init vectors (agg.py:156-281, :478-681).  On TPU the same aggregators
collapse into single fused map -> monoid-reduce -> finalize kernels over the
stored elements; each Aggregator here is a declarative spec of those three
stages plus flags for count/index-carrying variants.  The recipe
decomposition of the reference is the correctness oracle (SURVEY §3.5).

Complete inventory (reference agg.py:289-696): sum, prod, all, any, min, max,
any_value, bitwise_all, bitwise_any; count, count_nonzero, count_zero,
sum_of_squares, sum_of_inverses, exists; hypot, logaddexp, logaddexp2;
L0norm, L1norm, L2norm, Linfnorm; mean, peak_to_peak, varp, vars, stdp,
stds, geometric_mean, harmonic_mean, root_mean_square; (ss) argmin, argmax,
first, last, first_index, last_index.
"""

import jax.numpy as jnp
import numpy as np

from .. import dtypes as _dt
from ..dtypes import lookup_dtype
from . import ufuncs as uf

__all__ = ["Aggregator", "TypedAggregator"]


def _float_ret(dt):
    if dt.is_float or dt.is_complex:
        return dt
    return _dt.FP64


class AggSpec:
    """map(values)->mapped; monoid-combine; finalize(acc, count)->result.

    monoid_name may be a builtin monoid name (str) or a Monoid object
    (user-defined aggregators).  composite, when set, is a list of child
    AggSpecs evaluated on the same input; finalize_fn then receives the
    child accumulators (in order) followed by the element count.
    """

    __slots__ = ("name", "map_fn", "monoid_name", "finalize_fn", "ret_rule",
                 "needs_count", "index_kind", "types_domain", "composite",
                 "custom")

    def __init__(self, name, map_fn, monoid_name, finalize_fn=None, *,
                 ret_rule=None, needs_count=False, index_kind=None,
                 types_domain="all", composite=None, custom=None):
        self.name = name
        self.map_fn = map_fn
        self.monoid_name = monoid_name
        self.finalize_fn = finalize_fn
        self.ret_rule = ret_rule
        self.needs_count = needs_count
        # index_kind: None | "argmin" | "argmax" | "first" | "last" |
        #             "first_index" | "last_index"
        self.index_kind = index_kind
        self.types_domain = types_domain
        self.composite = composite
        self.custom = custom


def _ident(x):
    return x


def _to_f(x):
    if uf.is_float(x) or uf.is_complex(x):
        return x
    return x.astype(jnp.float64)


_SPECS = {}


def _spec(*args, **kwargs):
    s = AggSpec(*args, **kwargs)
    _SPECS[s.name] = s
    return s


# --- monoid-only (reference :290-298)
_spec("sum", _ident, "plus")
_spec("prod", _ident, "times")
_spec("all", lambda x: x if uf.is_bool(x) else x != 0, "land", ret_rule=_dt.BOOL)
_spec("any", lambda x: x if uf.is_bool(x) else x != 0, "lor", ret_rule=_dt.BOOL)
_spec("min", _ident, "min")
_spec("max", _ident, "max")
_spec("any_value", _ident, "any")
_spec("bitwise_all", _ident, "band", types_domain="uint")
_spec("bitwise_any", _ident, "bor", types_domain="uint")

# --- semiring-based counts/sums (reference :301-367)
_spec("count", lambda x: jnp.ones(x.shape, jnp.int64), "plus", ret_rule=_dt.INT64)
_spec(
    "count_nonzero",
    lambda x: (x != 0).astype(jnp.int64),
    "plus",
    ret_rule=_dt.INT64,
)
_spec("count_zero", lambda x: (x == 0).astype(jnp.int64), "plus", ret_rule=_dt.INT64)
_spec("sum_of_squares", lambda x: x * x, "plus", ret_rule=lambda dt: dt if dt.is_float or dt.is_complex else _dt.INT64)
_spec("sum_of_inverses", lambda x: 1.0 / _to_f(x), "plus", ret_rule=_float_ret)
_spec("exists", lambda x: jnp.ones(x.shape, jnp.int64), "any", ret_rule=_dt.INT64)
_spec("hypot", lambda x: _to_f(x) ** 2, "plus", lambda acc, cnt: jnp.sqrt(acc),
      ret_rule=_float_ret)
_spec("logaddexp", lambda x: jnp.exp(_to_f(x)), "plus", lambda acc, cnt: jnp.log(acc),
      ret_rule=_float_ret)
_spec("logaddexp2", lambda x: jnp.exp2(_to_f(x)), "plus", lambda acc, cnt: jnp.log2(acc),
      ret_rule=_float_ret)
_spec("L0norm", lambda x: (x != 0).astype(jnp.int64), "plus", ret_rule=_dt.INT64)
_spec("L1norm", lambda x: jnp.abs(x) if not uf.is_bool(x) else x.astype(jnp.int64), "plus",
      ret_rule=lambda dt: _dt.INT64 if dt.is_bool else dt)
_spec("L2norm", lambda x: _to_f(jnp.abs(x)) ** 2, "plus", lambda acc, cnt: jnp.sqrt(acc),
      ret_rule=_float_ret)
_spec("Linfnorm", lambda x: jnp.abs(_to_f(x)), "max", ret_rule=_float_ret)

# --- composite with finalize (reference :421-474)
_spec("mean", _to_f, "plus", lambda acc, cnt: acc / cnt, ret_rule=_float_ret,
      needs_count=True)
_spec("peak_to_peak", _ident, "minmax")  # special: engine computes max - min
_spec("varp", _to_f, "var_p", ret_rule=_float_ret, needs_count=True)
_spec("vars", _to_f, "var_s", ret_rule=_float_ret, needs_count=True)
_spec("stdp", _to_f, "std_p", ret_rule=_float_ret, needs_count=True)
_spec("stds", _to_f, "std_s", ret_rule=_float_ret, needs_count=True)
_spec("geometric_mean", lambda x: jnp.log(_to_f(x)), "plus",
      lambda acc, cnt: jnp.exp(acc / cnt), ret_rule=_float_ret, needs_count=True)
_spec("harmonic_mean", lambda x: 1.0 / _to_f(x), "plus",
      lambda acc, cnt: cnt / acc, ret_rule=_float_ret, needs_count=True)
_spec("root_mean_square", lambda x: _to_f(x) ** 2, "plus",
      lambda acc, cnt: jnp.sqrt(acc / cnt), ret_rule=_float_ret, needs_count=True)

# --- ss-only positional (reference :570-696)
_spec("argmin", _ident, "min", ret_rule=_dt.INT64, index_kind="argmin")
_spec("argmax", _ident, "max", ret_rule=_dt.INT64, index_kind="argmax")
_spec("first", _ident, "any", index_kind="first")
_spec("last", _ident, "any", index_kind="last")
_spec("first_index", _ident, "min", ret_rule=_dt.INT64, index_kind="first_index")
_spec("last_index", _ident, "max", ret_rule=_dt.INT64, index_kind="last_index")

_SS_ONLY = frozenset(["argmin", "argmax", "first", "last", "first_index", "last_index"])


def _spec_from_parts(name, *, initval=None, monoid=None, semiring=None,
                     switch=False, semiring2=None, applybegin=None,
                     finalize=None, composite=None, custom=None, types=None,
                     any_dtype=None):
    """Compile reference-style declarative parts into an AggSpec
    (reference core/operator/agg.py:30-140; see Aggregator docstring)."""
    import inspect

    from .utils import get_typed_op
    from .base import find_opclass

    if custom is not None:
        return AggSpec(name, _ident, "plus", custom=custom)

    # return-type rule from any_dtype
    if any_dtype is True or any_dtype is None:
        ret_rule = None
    else:
        ret_rule = lookup_dtype(any_dtype)

    def _unary_jax(op):
        op_obj, oc = find_opclass(op)
        if oc == "UnaryOp":
            def f(x):
                typed = get_typed_op(op_obj, lookup_dtype(x.dtype), kind="unary")
                return typed._jax_func(x)

            f._op = op_obj
            return f
        if callable(op):
            return op
        raise TypeError(f"expected a UnaryOp or callable; got {op!r}")

    if composite is not None:
        children = []
        for child in composite:
            child_obj, oc = find_opclass(child)
            if oc != "Aggregator":
                raise TypeError(f"composite children must be Aggregators; got {child!r}")
            children.append(child_obj.spec)
        if finalize is None:
            raise TypeError("composite aggregators require finalize")
        fin = finalize
        nparams = None
        try:
            nparams = len(inspect.signature(fin).parameters)
        except (TypeError, ValueError):
            pass
        if nparams is not None and nparams == len(children):
            fin_fn = lambda *args: fin(*args[:-1])  # noqa: E731 — drop count
        else:
            fin_fn = fin
        return AggSpec(name, _ident, "plus", fin_fn, ret_rule=ret_rule,
                       needs_count=True, composite=children)

    pre = _unary_jax(applybegin) if applybegin is not None else None

    if monoid is not None:
        mono_obj, oc = find_opclass(monoid)
        if oc == "Semiring":  # e.g. Aggregator('logaddexp', monoid=semiring.numpy.logaddexp)
            mono_obj = mono_obj.monoid
            oc = "Monoid"
        if oc != "Monoid":
            raise TypeError(f"monoid= must be a Monoid; got {monoid!r}")
        map_fn = pre if pre is not None else _ident
        spec = AggSpec(name, map_fn, mono_obj, ret_rule=ret_rule)
        return spec

    if semiring is None:
        raise TypeError(
            "Aggregator requires one of monoid=, semiring=, composite=, custom=")

    ring_obj, oc = find_opclass(semiring)
    if oc != "Semiring":
        raise TypeError(f"semiring= must be a Semiring; got {semiring!r}")
    mult = ring_obj.binaryop
    mono_obj = ring_obj.monoid
    init = False if initval is None else initval
    init_dt = lookup_dtype(np.asarray(init).dtype)

    def map_fn(x):
        y = pre(x) if pre is not None else x
        xdt = lookup_dtype(y.dtype)
        typed = (get_typed_op(mult, init_dt, xdt, kind="binary") if switch
                 else get_typed_op(mult, xdt, init_dt, kind="binary"))
        iv = jnp.asarray(init, typed.type.np_type)
        xv = y.astype(typed.type.np_type)
        return typed._jax_func(iv, xv) if switch else typed._jax_func(xv, iv)

    fin_fn = None
    if finalize is not None:
        fu = _unary_jax(finalize)
        nparams = None
        try:
            nparams = len(inspect.signature(finalize).parameters)
        except (TypeError, ValueError):
            pass
        if hasattr(fu, "_op") or nparams == 1:
            fin_fn = lambda acc, cnt: fu(acc)  # noqa: E731
        else:
            fin_fn = fu

    if ret_rule is None:
        def ret_rule(dt):  # noqa: F811 — infer through the op chain
            try:
                d = dt
                if pre is not None and hasattr(pre, "_op"):
                    d = get_typed_op(pre._op, d, kind="unary").return_type
                typed_mult = (get_typed_op(mult, init_dt, d, kind="binary")
                              if switch else
                              get_typed_op(mult, d, init_dt, kind="binary"))
                d = typed_mult.return_type
                d = get_typed_op(mono_obj, d, kind="monoid").return_type
                if fin_fn is not None and hasattr(finalize, "name"):
                    d = get_typed_op(finalize, d, kind="unary").return_type
                return d
            except Exception:
                return dt

    return AggSpec(name, map_fn, mono_obj, fin_fn, ret_rule=ret_rule)

_UINTS = [_dt.UINT8, _dt.UINT16, _dt.UINT32, _dt.UINT64]
_ALL13 = [
    _dt.BOOL, _dt.INT8, _dt.INT16, _dt.INT32, _dt.INT64,
    _dt.UINT8, _dt.UINT16, _dt.UINT32, _dt.UINT64,
    _dt.FP32, _dt.FP64, _dt.FC32, _dt.FC64,
]
_D11 = _ALL13[:11]


class TypedAggregator:
    __slots__ = "parent", "name", "type", "return_type", "spec", "__weakref__"
    opclass = "Aggregator"

    def __init__(self, parent, type_):
        self.parent = parent
        self.name = parent.name
        self.type = type_
        self.spec = parent.spec
        rr = parent.spec.ret_rule
        if rr is None:
            self.return_type = type_
        elif callable(rr):
            self.return_type = rr(type_)
        else:
            self.return_type = rr

    def __repr__(self):
        return f"agg.{self.name}[{self.type.name}]"

    @property
    def _typed_class(self):
        return "TypedAggregator"

    def __call__(self, val):
        from .utils import _call_op

        return _call_op(self.parent, val)


class Aggregator:
    """An aggregator: a reduction beyond plain monoids.

    Two construction modes:

    - internal: ``Aggregator(name, spec)`` with a prebuilt AggSpec.
    - reference-compatible (reference core/operator/agg.py:30-140):
      ``Aggregator(name, monoid=..., semiring=..., initval=..., switch=...,
      semiring2=..., applybegin=..., finalize=..., composite=..., types=...,
      any_dtype=...)``.  The declarative parts are compiled into a fused
      map -> monoid-combine -> finalize AggSpec:

      * ``monoid`` — reduce with that monoid (or a semiring's monoid).
      * ``semiring`` + ``initval`` (default False) + ``switch`` — each stored
        element x is mapped via ``mult(x, initval)`` (``mult(initval, x)``
        when switch), then combined with the semiring's monoid.  This is the
        jax-native equivalent of the reference's ``semiring(A @ dense_init)``
        recipe; ``semiring2`` (the vector-path semiring) is accepted and
        ignored because both paths share one kernel here.
      * ``applybegin`` — UnaryOp applied to elements first.
      * ``finalize`` — UnaryOp (or jax-traceable f(acc) / f(acc, count))
        applied to the accumulator.
      * ``composite=[child aggregators]`` — children are evaluated on the
        same input; ``finalize`` then receives the child accumulator arrays
        in order (followed by the count if it accepts it).  NOTE: the
        reference's collection-expression finalize functions are not
        supported — pass a jax-traceable function of arrays instead.
      * ``any_dtype`` — a DataType fixing the return type, or True to return
        the input type for any input.
    """

    __slots__ = "name", "spec", "_typed_ops", "_anonymous", "__weakref__"
    opclass = "Aggregator"

    def __init__(self, name, spec=None, *, anonymous=False, **kwargs):
        self.name = name
        if spec is None:
            spec = _spec_from_parts(name, **kwargs)
        elif kwargs:
            raise TypeError("cannot pass both a spec and declarative parts")
        self.spec = spec
        self._typed_ops = {}
        self._anonymous = anonymous

    def __repr__(self):
        return f"agg.{self.name}"

    def __getitem__(self, type_):
        type_ = lookup_dtype(type_)
        if type_ not in self._typed_ops:
            if type_ not in self.types:
                raise KeyError(f"{self.name} does not work with {type_}")
            self._typed_ops[type_] = TypedAggregator(self, type_)
        return self._typed_ops[type_]

    def __contains__(self, type_):
        try:
            self[type_]
        except (KeyError, TypeError):
            return False
        return True

    @property
    def types(self):
        spec = self.spec
        if spec.types_domain == "uint":
            domain = _UINTS
        elif not isinstance(spec.monoid_name, str):
            # user-defined aggregator: domain follows its monoid
            mono = spec.monoid_name
            domain = [dt for dt in _ALL13 if dt in mono] or _ALL13
        elif spec.monoid_name in ("min", "max", "minmax", "var_p", "var_s", "std_p", "std_s"):
            domain = _D11
        else:
            domain = _ALL13
        out = {}
        for dt in domain:
            rr = spec.ret_rule
            out[dt] = dt if rr is None else (rr(dt) if callable(rr) else rr)
        return out

    def __call__(self, val):
        from .utils import _call_op

        return _call_op(self, val)

    def __reduce__(self):
        # pickle by namespace + name, like every other op kind
        # (core/operator/base.py __reduce__; reference base.py:265-272)
        from .base import _op_from_namespace

        return (_op_from_namespace, ("agg", self.name))


def _initialize_builtins(namespace):
    ops = {}
    ss_ops = {}
    for name, spec in _SPECS.items():
        a = Aggregator(name, spec)
        if name in _SS_ONLY:
            ss_ops[name] = a
        else:
            ops[name] = a
    namespace.update(ops)
    return ops, ss_ops
