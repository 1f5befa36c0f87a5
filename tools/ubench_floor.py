"""Measure dispatch floor + amortized per-op cost on the tunneled TPU."""

import time

import numpy as np

import jax
import jax.numpy as jnp


def timeit(name, f, *args, reps=5):
    t0 = time.perf_counter()
    jax.block_until_ready(f(*args))
    compile_s = time.perf_counter() - t0
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} compile={compile_s:7.2f}s  run={best*1e3:9.3f}ms")
    return best


N = 1 << 17
DEG = 16
rng = np.random.default_rng(0)
nnz = N * DEG
src = jnp.asarray(rng.integers(0, N, nnz).astype(np.int32))
x = jnp.asarray(rng.random(N, np.float32))
big = jnp.asarray(rng.random(nnz, np.float32))

timeit("tiny x+1", jax.jit(lambda x: x + 1.0), x)
timeit("big elementwise (2M)", jax.jit(lambda b: b * 2.0 + 1.0), big)


def loop20_ew(b):
    def body(i, cur):
        return cur * 1.000001 + 0.5
    return jax.lax.fori_loop(0, 20, body, b)


t = timeit("20x elementwise fori (2M)", jax.jit(loop20_ew), big)
print(f"  per ew pass: {t/20*1e3:.3f}ms -> {nnz*4*2/ (t/20)/1e9:.1f} GB/s")


def loop20_gather(x):
    def body(i, cur):
        return jnp.take(cur * 1.0000001, src) [:N]
    return jax.lax.fori_loop(0, 20, body, x)


t = timeit("20x gather fori (2M idx)", jax.jit(loop20_gather), x)
print(f"  per gather: {t/20*1e3:.3f}ms -> {nnz/(t/20)/1e9:.3f} Gidx/s")


def loop20_cumsum(b):
    def body(i, cur):
        c2 = cur.reshape(-1, 512)
        local = jnp.cumsum(c2, axis=1)
        return local.reshape(-1) * 0.5
    return jax.lax.fori_loop(0, 20, body, big)


t = timeit("20x blocked cumsum fori (2M)", jax.jit(loop20_cumsum), big)
print(f"  per cumsum: {t/20*1e3:.3f}ms")
