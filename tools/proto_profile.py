"""Profile each pipeline step on TPU at realistic scale (L=4M)."""

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BC = 128
BR = 256


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
    return best


def segscan_call(barrier, vals, combines):
    L = barrier.shape[0]
    R = L // BC

    def kernel(*refs):
        nv = len(combines)
        b_ref = refs[0]
        v_refs = refs[1:1 + nv]
        o_refs = refs[1 + nv:1 + 2 * nv]
        vcars = refs[1 + 2 * nv:1 + 3 * nv]
        bcar = refs[1 + 3 * nv]
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            bcar[0, 0] = 1

        b = b_ref[:] != 0
        vs = [r[:] for r in v_refs]
        lane = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 0)
        for s in [1 << k for k in range(7)]:
            bsh = pltpu.roll(b.astype(jnp.int32), s, 1) != 0
            okm = lane >= s
            vs = [jnp.where(b | ~okm, v, c(pltpu.roll(v, s, 1), v))
                  for v, c in zip(vs, combines)]
            b = b | (okm & bsh)
        for s in [1 << k for k in range(8)]:
            bsh = pltpu.roll(b.astype(jnp.int32), s, 0) != 0
            okm = row >= s
            last_b = jnp.broadcast_to(bsh[:, BC - 1:BC], (BR, BC))
            vs = [jnp.where(b | ~okm, v,
                            c(jnp.broadcast_to(pltpu.roll(v, s, 0)[:, BC - 1:BC],
                                               (BR, BC)), v))
                  for v, c in zip(vs, combines)]
            b = b | (okm & last_b)
        merged = [jnp.where(b | (bcar[0, 0] != 0), v, c(vcar[0, 0], v))
                  for v, c, vcar in zip(vs, combines, vcars)]
        bseen = b | (bcar[0, 0] != 0)
        for o, v in zip(o_refs, merged):
            o[:] = v
        for vcar, v in zip(vcars, merged):
            vcar[0, 0] = v[BR - 1, BC - 1]
        bcar[0, 0] = bseen.astype(jnp.int32)[BR - 1, BC - 1]

    spec = pl.BlockSpec((BR, BC), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[spec] * (1 + len(vals)),
        out_specs=tuple([spec] * len(vals)),
        out_shape=tuple(jax.ShapeDtypeStruct((R, BC), v.dtype) for v in vals),
        scratch_shapes=[pltpu.SMEM((1, 1), v.dtype) for v in vals]
        + [pltpu.SMEM((1, 1), jnp.int32)],
    )(barrier.reshape(R, BC), *[v.reshape(R, BC) for v in vals])
    return [o.reshape(L) for o in outs]


L = 1 << 22
rng = np.random.default_rng(0)
perm = jnp.asarray(rng.permutation(L).astype(np.int32))
vals = jnp.asarray(rng.random(L, np.float32))
bar = jnp.asarray((rng.random(L) < 0.06).astype(np.int32))

# 1. single sort alone
timeit("sort alone (4M)", jax.jit(
    lambda p, v: jax.lax.sort((p, v), num_keys=1)[1]), perm, vals)

# 2. two sorts in one jit
timeit("2 sorts same jit", jax.jit(
    lambda p, v: jax.lax.sort(
        (p, jax.lax.sort((p, v), num_keys=1)[1]), num_keys=1)[1]), perm, vals)

# 3. segscan alone (2 payloads)
ok = jnp.asarray(rng.integers(0, 2, L).astype(np.int32))
plus = lambda a, b: a + b  # noqa: E731
timeit("segscan alone (4M, 2 payloads)", jax.jit(
    lambda b, v, o: segscan_call(b, [v, o], [plus, plus])), bar, vals, ok)

# 4. sort -> segscan -> sort chained
def chain(p, v, b):
    v1 = jax.lax.sort((p, v), num_keys=1)[1]
    v2 = segscan_call(b, [v1], [plus])[0]
    return jax.lax.sort((p, v2), num_keys=1)[1]

timeit("sort+segscan+sort chained", jax.jit(chain), perm, vals, bar)

# 5. six sorts chained
def six(p, v):
    for _ in range(6):
        v = jax.lax.sort((p, v), num_keys=1)[1]
    return v

timeit("6 sorts chained", jax.jit(six), perm, vals)

# 6. sort i32 key + i64 payload (packed 2x32)
v64 = jnp.asarray(rng.integers(0, 1 << 60, L).astype(np.int64))
timeit("sort i64 payload", jax.jit(
    lambda p, v: jax.lax.sort((p, v), num_keys=1)[1]), perm, v64)
