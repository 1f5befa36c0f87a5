"""Measure tpu.dynamic_gather (sublane gather, same-shape) cost vs height W.

out[i,j] = tbl[ix[i,j], j] via jnp.take_along_axis(tbl, ix, axis=0) where
tbl, ix, out are all (W, 128).  This is the only arbitrary-range gather
Mosaic lowers (lowering.py:_gather_lowering_rule).  Total gathered elements
per pallas invocation = L (grid tiles the (R,128) index/out arrays; the
table block is the full (W,128), resident across grid steps).
"""

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

rng = np.random.default_rng(0)
ITERS = 32
L = 1 << 23
R = L // 128


def bench_loop(name, step, init, elems=None, iters=ITERS):
    @jax.jit
    def run(state):
        return jax.lax.fori_loop(0, iters, lambda i, s: step(s), state)

    @jax.jit
    def empty(state):
        return jax.lax.fori_loop(0, iters, lambda i, s: s, state)

    def force(out):
        leaf = jax.tree_util.tree_leaves(out)[0]
        return float(jnp.asarray(leaf).reshape(-1)[0])

    try:
        t0 = time.perf_counter()
        out = run(init)
        force(out)
        compile_s = time.perf_counter() - t0
    except Exception as e:  # noqa: BLE001
        print(f"{name:44s} FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)
        return None
    force(empty(init))
    best = np.inf
    base = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        force(empty(init))
        base = min(base, time.perf_counter() - t0)
        t0 = time.perf_counter()
        force(run(init))
        best = min(best, time.perf_counter() - t0)
    per = (best - base) / iters
    rate = f"({elems / per / 1e9:7.2f} Gelem/s)" if elems else ""
    print(f"{name:44s} compile={compile_s:6.1f}s  {per * 1e3:9.3f} ms/op "
          f"{rate} [base {base * 1e3:.1f}ms]", flush=True)
    return per, out


Ws = [int(a) for a in sys.argv[1:]] or [128, 256, 512, 1024, 4096, 8192]

for W in Ws:
    tbl = jnp.asarray(rng.random((W, 128), np.float32))
    idx = rng.integers(0, W, (R, 128)).astype(np.int32)
    idxj = jnp.asarray(idx)

    def kg(t_ref, i_ref, o_ref, W=W):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    @jax.jit
    def gg(t, ix, kg=kg, W=W):
        return pl.pallas_call(
            kg,
            grid=(R // W,),
            in_specs=[
                pl.BlockSpec((W, 128), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, 128), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((W, 128), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((R, 128), jnp.float32),
        )(t, ix)

    def step(s, gg=gg, idxj=idxj):
        t, _ = s
        o = gg(t, idxj)
        return (t + o[0, 0] * 1e-30, o)

    r = bench_loop(f"dyngather W={W} ({W * 512}B tbl)", step,
                   (tbl, jnp.zeros((R, 128), jnp.float32)), elems=L)
    if r is not None:
        oh = np.asarray(r[1][1])
        exp = np.take_along_axis(np.asarray(tbl), idx[:W], axis=0)
        print("   correct:", bool(np.allclose(oh[:W], exp, atol=1e-5)),
              flush=True)
