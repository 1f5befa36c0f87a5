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


def burble():
    return config["burble"]


# scoped 64-bit mode over module entry points (core/utils.py:x64_func)
from ..core.utils import x64_func as _x64_func  # noqa: E402
diag = _x64_func(diag)
concat = _x64_func(concat)
