"""gb.ss: global extension namespace (reference graphblas/ss/_core.py).

Provides: `config` (global engine config), `about` (version/platform info),
`diag`, `concat`, `Context` (execution contexts), burble.  Names kept for
drop-in compatibility; semantics adapted to the TPU engine (e.g. `nthreads`
maps to XLA's internal parallelism and is informational).
"""

import numpy as np

from .. import __version__ as _version
from ..core.ss.context import Context, global_context  # noqa: F401


class GlobalConfig(dict):
    """Global engine config (reference ss/_core.py:110).

    Accepted keys mirror the reference; TPU-relevant ones take effect
    (`burble` controls engine logging, `format` sets default orientation),
    the rest are stored and surfaced for introspection.
    """

    _defaults = {
        "format": "by_row",
        "hyper_switch": 0.0625,
        "bitmap_switch": [0.04, 0.05, 0.06, 0.08, 0.1, 0.2, 0.3, 0.4],
        "nthreads": 1,
        "chunk": 65536,
        "burble": False,
        "print_1based": False,
        "gpu_control": "always",
        "gpu_chunk": 0.0,
        "memory_pool": [],
    }

    def __init__(self):
        super().__init__(self._defaults)

    def __setitem__(self, key, value):
        if key not in self:
            raise KeyError(f"Unknown config key: {key}")
        super().__setitem__(key, value)


config = GlobalConfig()


class About(dict):
    """Reference ss/_core.py:221."""

    def __init__(self):
        import jax

        super().__init__(
            {
                "library_name": "graphblas_tpu",
                "library_version": tuple(int(x) for x in _version.split(".")),
                "engine": "JAX/XLA/Pallas",
                "jax_version": jax.__version__,
                "platform": jax.default_backend(),
                "devices": [str(d) for d in jax.devices()],
                "openmp": False,
                "mode": "non-blocking",
            }
        )


about = About()


def diag(x, k=0, dtype=None, *, name=None, **opts):
    """Vector -> diagonal Matrix, or Matrix -> diagonal Vector.
    Reference ss/_core.py:24."""
    from ..core.matrix import Matrix, TransposedMatrix
    from ..core.vector import Vector

    if isinstance(x, TransposedMatrix):
        x = x.new()
    if isinstance(x, Vector):
        rv = x.diag(k, name=name)
    elif isinstance(x, Matrix):
        rv = x.diag(k, name=name)
    else:
        raise TypeError(f"diag requires a Vector or Matrix; got {type(x)}")
    if dtype is not None:
        rv = rv.dup(dtype)
    return rv


def concat(tiles, dtype=None, *, name=None, **opts):
    """Concatenate a 2-D grid of Matrix tiles (reference ss/_core.py:73)."""
    import jax.numpy as jnp

    from ..core.dtypes import unify, lookup_dtype
    from ..core.matrix import Matrix, TransposedMatrix
    from ..core.vector import Vector

    if not isinstance(tiles, (list, tuple)) or not tiles:
        raise TypeError("tiles argument must be a non-empty list")
    if isinstance(tiles[0], (Vector,)):
        # 1-D concat of vectors
        vals = jnp.concatenate([t._vals for t in tiles])
        ok = jnp.concatenate([t._valid for t in tiles])
        dt = tiles[0].dtype
        for t in tiles[1:]:
            dt = unify(dt, t.dtype)
        if dtype is not None:
            dt = lookup_dtype(dtype)
        from ..core.engine import store as st

        return Vector._from_store(
            dt, st.cast_values(vals, tiles[0].dtype, dt) if False else vals.astype(dt.np_type), ok, name=name
        )
    rows = []
    dt = None
    for row in tiles:
        if not isinstance(row, (list, tuple)) or not row:
            raise TypeError("tiles must be a list of lists of Matrices")
        parts_v = []
        parts_ok = []
        for t in row:
            if isinstance(t, TransposedMatrix):
                t = t.new()
            if not isinstance(t, Matrix):
                raise TypeError(f"tiles must be Matrices; got {type(t)}")
            dt = t.dtype if dt is None else unify(dt, t.dtype)
            parts_v.append(t._vals)
            parts_ok.append(t._valid)
        rows.append((parts_v, parts_ok))
    if dtype is not None:
        dt = lookup_dtype(dtype)
    row_vals = [jnp.concatenate([p.astype(dt.np_type) for p in pv], axis=1)
                for pv, _ in rows]
    row_ok = [jnp.concatenate(po, axis=1) for _, po in rows]
    vals = jnp.concatenate(row_vals, axis=0)
    ok = jnp.concatenate(row_ok, axis=0)
    return Matrix._from_store(dt, vals, ok, name=name)


_ITERATE_CACHE = {}


def _captured_collections_token(body, cond):
    """Identity token for every collection body/cond can see.

    Walks closure cells and the referenced module globals (descending one
    level into list/tuple/dict containers) and records the identity of
    each collection's store arrays and sparse structure.  A collection
    mutated in place between iterate calls therefore changes the token
    and forces a re-trace (stale-capture fix, round-4 advisor finding)."""
    from ..core.base import BaseType

    toks = []

    def add(obj, depth=0):
        if isinstance(obj, BaseType):
            # raw store attributes: the _vals/_valid properties densify
            toks.append((id(obj), id(getattr(obj, "_d_vals", None)),
                         id(getattr(obj, "_d_valid", None)),
                         id(getattr(obj, "_sparse", None)),
                         id(getattr(obj, "_dist", None))))
        elif depth < 1 and isinstance(obj, (list, tuple)):
            for v in obj:
                add(v, depth + 1)
        elif depth < 1 and isinstance(obj, dict):
            for v in obj.values():
                add(v, depth + 1)

    for fn in (body, cond):
        if fn is None:
            continue
        code = getattr(fn, "__code__", None)
        if code is None:
            continue
        for cell in fn.__closure__ or ():
            try:
                add(cell.cell_contents)
            except ValueError:  # empty cell
                pass
        g = getattr(fn, "__globals__", {})
        for name in code.co_names:
            if name in g:
                add(g[name])
    return tuple(toks)


def iterate(body, state, *, cond=None, max_iter=64):
    """Run an algorithm loop entirely on device as ONE compiled program.

    TPU-native extension (no reference analog; precedent for ss-only
    surface: Context, reference core/ss/context.py:19).  The eager API
    dispatches one fused kernel per GraphBLAS call, which is the right
    shape for interactive use — but an iterative algorithm like level-BFS
    (reference notebooks/Example B.1, SURVEY \u00a73.6) pays a host
    round-trip per iteration for its termination check.  ``iterate``
    traces ``body`` once and runs it under ``jax.lax.while_loop``, so the
    whole loop — every masked vxm, assign and reduce — executes as a
    single device program with zero host synchronization until it
    finishes.

    Parameters
    ----------
    body : callable(state, i)
        Mutates the ``state`` collections in place through normal
        GraphBLAS calls.  ``i`` is a 1-based iteration counter Scalar
        (INT64) usable as an operand (e.g. ``v(mask=q.V)[:] = i``).
        Must not inspect host values (``.nvals``, ``bool(...)``) — shapes
        and dispatch configuration must be iteration-independent.
    state : dict[str, Vector | Matrix]
        Dense-backed collections carried through the loop.  Updated in
        place with the final values when the loop ends.
    cond : callable(state, i) -> Scalar, optional
        Evaluated after each body run; the loop continues while its value
        is truthy (do-while semantics).  None runs exactly ``max_iter``
        iterations.
    max_iter : int
        Static iteration bound (the loop always stops here).

    Returns
    -------
    int-like
        The number of iterations executed, as a 0-d device value (reading
        it synchronizes with the device).
    """
    import jax
    import jax.numpy as jnp

    from ..core import execute as _execute
    from ..core.dtypes import INT64
    from ..core.scalar import Scalar
    from ..core.vector import Vector

    from ..core.matrix import Matrix

    names = list(state)
    for name in names:
        v = state[name]
        if not isinstance(v, (Vector, Matrix)):
            raise TypeError(
                f"state[{name!r}] must be a Vector or Matrix; got {type(v)}")
        if v._sparse is not None:
            v._densify()

    def make_state(arrays):
        out = {}
        for name, (vals, valid) in zip(names, arrays):
            out[name] = type(state[name])._from_store(
                state[name].dtype, vals, valid, name=name)
        return out

    # this runtime charges a fixed ~0.13 ms per while-loop iteration
    # (state-size independent); for pure trip-count loops the body is
    # unrolled so several algorithm iterations share one while iteration
    unroll = 1
    if cond is None:
        for u in (4, 2):
            if max_iter % u == 0:
                unroll = u
                break

    def body_fn(carry):
        i, arrays, _ = carry
        cont = jnp.ones((), bool)
        for _ in range(unroll):
            i = i + 1
            st_objs = make_state(arrays)
            i_scalar = Scalar._from_store(INT64, i, jnp.ones((), bool))
            body(st_objs, i_scalar)
            if cond is not None:
                c = cond(st_objs, i_scalar)
                cont = jnp.asarray(c._vals).astype(bool) & c._valid
            arrays = tuple((st_objs[n]._vals, st_objs[n]._valid)
                           for n in names)
        return (i, arrays, cont)

    def cond_fn(carry):
        i, _, cont = carry
        return cont & (i < max_iter)

    init = (jnp.zeros((), jnp.int64),
            tuple((state[n]._vals, state[n]._valid) for n in names),
            jnp.ones((), bool))

    # compiled-loop cache: repeated calls with the same body/cond/state
    # spec reuse the executable.  The key includes an identity token for
    # every collection the body/cond capture (closure cells + referenced
    # globals, one container level deep), so a collection mutated in
    # place between calls — new store arrays, new sparse structure —
    # forces a re-trace instead of silently replaying stale captured
    # buffers (round-4 advisor finding).  The cache is a small LRU so
    # long-lived processes don't pin dead closures and their device
    # arrays forever.
    spec = tuple((name, state[name].dtype.name, state[name].shape)
                 for name in names)
    ckey = (id(body), id(cond), spec, max_iter,
            _captured_collections_token(body, cond))
    # (unroll is derived from cond/max_iter, both already in the key)
    prev_blocking = _execute._loop_tracing
    _execute._loop_tracing = True
    try:
        with jax.enable_x64(True):
            got = _ITERATE_CACHE.pop(ckey, None)
            if got is None:
                def run(init):
                    return jax.lax.while_loop(cond_fn, body_fn, init)

                # hoist every device array the body closes over (engine
                # plan arrays etc.) into explicit arguments: an array
                # baked into the program as a CONSTANT bloats the
                # executable (~160 MB of HLO literal for a 9.4M-edge
                # plan, overflowing the remote compiler) and is read back
                # to host at lowering, which permanently degrades the
                # tunneled-TPU runtime (round-4 finding).
                # jax.closure_convert does NOT lift concrete captures on
                # this JAX version, so hoist via make_jaxpr: its
                # top-level consts are exactly the captured arrays.
                closed, out_shape = jax.make_jaxpr(
                    run, return_shape=True)(init)
                consts = closed.consts
                out_tree = jax.tree_util.tree_structure(out_shape)
                jaxpr = closed.jaxpr

                def conv(init, consts):
                    flat = jax.tree_util.tree_leaves(init)
                    out_flat = jax.core.eval_jaxpr(jaxpr, consts, *flat)
                    return jax.tree_util.tree_unflatten(out_tree, out_flat)

                jf = jax.jit(conv)
                # hold body/cond refs so the id()-based key stays live
                got = (jf, consts, body, cond)
            _ITERATE_CACHE[ckey] = got
            while len(_ITERATE_CACHE) > 16:
                _ITERATE_CACHE.pop(next(iter(_ITERATE_CACHE)))
            jf, consts = got[0], got[1]
            i, arrays, _ = jf(init, consts)
    finally:
        _execute._loop_tracing = prev_blocking
    for name, (vals, valid) in zip(names, arrays):
        state[name]._set_store(vals, valid)
    return i


def burble():
    return config["burble"]


# scoped 64-bit mode over module entry points (core/utils.py:x64_func)
from ..core.utils import x64_func as _x64_func  # noqa: E402
diag = _x64_func(diag)
concat = _x64_func(concat)
iterate = _x64_func(iterate)
