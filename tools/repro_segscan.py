"""Unit-test _segscan_pallas on TPU against a numpy reference."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax
import jax.numpy as jnp

import graphblas_tpu  # noqa: F401  (x64 on)
from graphblas_tpu.core.engine import sortpipe

print("backend:", jax.default_backend(), flush=True)


def ref_segscan(barrier, vals):
    out = np.empty_like(vals)
    acc = 0
    for i in range(len(vals)):
        acc = vals[i] if barrier[i] else acc + vals[i]
        out[i] = acc
    return out


for logL in [20, 21, 22, 23]:
    L = 1 << logL
    rng = np.random.default_rng(logL)
    barrier = (rng.random(L) < 0.01).astype(np.int32)
    barrier[0] = 1
    vals = rng.integers(0, 100, L).astype(np.int32)
    b = jnp.asarray(barrier)
    v = jnp.asarray(vals)
    comb = lambda a, c: a + c  # noqa: E731
    with jax.enable_x64(False):
        got = jax.jit(
            lambda b, v: sortpipe._segscan_pallas(b, [v], (comb,))[0])(b, v)
    g = np.asarray(got)
    r = ref_segscan(barrier, vals)
    ok = np.array_equal(g, r)
    print(f"L=2^{logL}: {'OK' if ok else 'FAIL'}", flush=True)
    if not ok:
        d = np.nonzero(g != r)[0]
        print(f"  {len(d)} diffs, first at {d[0]}: got={g[d[0]]} ref={r[d[0]]}",
              flush=True)
        blocks = np.unique(d // (256 * 128))
        print(f"  diff grid-blocks ({len(blocks)}):", blocks[:20], flush=True)
