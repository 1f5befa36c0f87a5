"""Engine-JIT operator registration (TPU analog of component 22).

The reference's second UDF path passes C source strings to the SuiteSparse
compiler JIT (reference core/ss/binary.py:33-77, unary.py:27, indexunary.py:27,
select.py:26).  Here the engine JIT is XLA: definitions are jax-traceable
Python, given either as a callable or as a source string (a ``lambda`` or a
``def``) evaluated with ``jnp``/``np``/``math`` in scope.  Registered ops
live under the ``ss`` namespace of their operator module
(``gb.binary.ss.<name>``), mirroring the reference's ``ss.``-prefixed names.

The dtype arguments are accepted for signature compatibility; tracing types
the op per call, so a single registration covers all dtypes (a superset of
the reference's fixed-signature registration).
"""

from ..dtypes import lookup_dtype


def _compile_definition(defn, name):
    if callable(defn):
        return defn
    if not isinstance(defn, str):
        raise TypeError(
            "jit definition must be a jax-traceable callable or Python source "
            f"string; got {type(defn)}"
        )
    import math

    import jax.numpy as jnp
    import numpy as np

    ns = {"jnp": jnp, "np": np, "math": math}
    src = defn.strip()
    # the reference's primary input format is a C definition string
    # (reference core/ss/binary.py:33); detect it and point at this
    # backend's Python-source contract instead of dying in exec()
    if ("{" in src.split("\n")[0] or src.startswith("void ")
            or "*z" in src or "GB_DECLARE" in src):
        raise TypeError(
            "jit definitions on the TPU backend are jax-traceable PYTHON "
            "source (a 'lambda ...' or 'def ...'), not C source.  Got what "
            f"looks like a C definition: {src[:60]!r}.  Write the same "
            "scalar function in Python; tracing compiles it per dtype."
        )
    if src.startswith("lambda"):
        return eval(src, ns)  # noqa: S307 — user-supplied op definition
    before = set(ns)
    try:
        exec(src, ns)  # noqa: S102 — user-supplied op definition
    except SyntaxError as e:
        raise TypeError(
            "jit definition is not valid Python source; the TPU backend "
            "takes jax-traceable Python (a 'lambda ...' or 'def ...'), "
            "not the reference's C strings"
        ) from e
    funcs = {k: v for k, v in ns.items() if k not in before and callable(v)}
    if name in funcs:
        return funcs[name]
    if len(funcs) == 1:
        return next(iter(funcs.values()))
    raise ValueError(
        f"could not find a function named {name!r} in the jit definition"
    )


def _short_name(name):
    return name[3:] if name.startswith("ss.") else name


def register_new_unary(name, jit_definition, input_type=None, ret_type=None):
    """Reference core/ss/unary.py:27 (C-source JIT) -> jax tracing."""
    from ..operator.unary import UnaryOp

    short = _short_name(name)
    if input_type is not None:
        lookup_dtype(input_type)
    if ret_type is not None:
        lookup_dtype(ret_type)
    func = _compile_definition(jit_definition, short)
    op = UnaryOp.register_anonymous(func, name=f"ss.{short}")
    import graphblas_tpu.unary as mod

    setattr(mod.ss, short, op)
    return op


def register_new_binary(name, jit_definition, left_type=None, right_type=None,
                        ret_type=None):
    """Reference core/ss/binary.py:33 (C-source JIT) -> jax tracing."""
    from ..operator.binary import BinaryOp

    short = _short_name(name)
    for t in (left_type, right_type, ret_type):
        if t is not None:
            lookup_dtype(t)
    func = _compile_definition(jit_definition, short)
    op = BinaryOp.register_anonymous(func, name=f"ss.{short}")
    import graphblas_tpu.binary as mod

    setattr(mod.ss, short, op)
    return op


def register_new_indexunary(name, jit_definition, input_type=None,
                            thunk_type=None, ret_type=None):
    """Reference core/ss/indexunary.py:27 (C-source JIT) -> jax tracing."""
    from ..operator.indexunary import IndexUnaryOp

    short = _short_name(name)
    for t in (input_type, thunk_type, ret_type):
        if t is not None:
            lookup_dtype(t)
    func = _compile_definition(jit_definition, short)
    op = IndexUnaryOp.register_anonymous(func, name=f"ss.{short}")
    import graphblas_tpu.indexunary as mod

    setattr(mod.ss, short, op)
    return op


def register_new_select(name, jit_definition, input_type=None, thunk_type=None):
    """Reference core/ss/select.py:26 (C-source JIT) -> jax tracing."""
    from ..operator.select import SelectOp

    short = _short_name(name)
    for t in (input_type, thunk_type):
        if t is not None:
            lookup_dtype(t)
    func = _compile_definition(jit_definition, short)
    op = SelectOp.register_anonymous(func, name=f"ss.{short}")
    import graphblas_tpu.select as mod

    setattr(mod.ss, short, op)
    return op
