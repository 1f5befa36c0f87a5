"""Check 6-sort timing with distinct keys + correctness; loop-amortized."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, f, *args, reps=5):
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:44s} compile={compile_s:7.2f}s  run={best*1e3:9.3f}ms")
    return out, best


L = 1 << 22
rng = np.random.default_rng(0)
perms = [rng.permutation(L).astype(np.int32) for _ in range(6)]
permsj = [jnp.asarray(p) for p in perms]
vals = rng.random(L).astype(np.float32)
valsj = jnp.asarray(vals)


def six(v, *ps):
    for p in ps:
        v = jax.lax.sort((p, v), num_keys=1)[1]
    return v


out, t = timeit("6 sorts distinct keys", jax.jit(six), valsj, *permsj)
# numpy oracle
ref = vals
for p in perms:
    o = np.argsort(p, kind="stable")
    ref = ref[o]
print("  correct:", np.array_equal(np.asarray(out), ref))


def loop100(v, p):
    def body(i, cur):
        return jax.lax.sort((p, cur * 1.0000001), num_keys=1)[1]
    return jax.lax.fori_loop(0, 100, body, v)


out, t = timeit("100 sorts fori_loop", jax.jit(loop100), valsj, permsj[0])
print(f"  per sort: {t/100*1e3:.3f}ms")
