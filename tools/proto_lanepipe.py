"""Lanepipe on the real chip: bench-graph vxm timing + plan packing stats."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import build_graph  # noqa: E402

n = int(os.environ.get("N", 1 << 19))
src, dst = build_graph(n, 8)
nnz = len(src)
print(f"n={n} nnz={nnz}")

from graphblas_tpu.core.engine import lanepipe  # noqa: E402

t0 = time.perf_counter()
outdeg = np.bincount(src, minlength=n).astype(np.float32)
w = (1.0 / outdeg[src]).astype(np.float32)
# vxm: dest = cols (zipf), contraction = rows (uniform)
plan = lanepipe.build_plan(dst.astype(np.int64), src.astype(np.int64),
                           w, n, n)
print(f"plan build {time.perf_counter()-t0:.2f}s")
if plan is None:
    print("PLAN INELIGIBLE (packing)")
else:
    print(f"L={plan['L']} ({plan['L']/nnz:.2f}x nnz)  R_g={plan['R_g']} "
          f"(G pack {plan['R_g']*128/nnz:.2f}x)  V={plan['V']} "
          f"two_level={plan['two_level']} nblocks_g={plan['nblocks_g']}")

# also the mxv direction (dest=rows uniform, contraction=cols zipf)
t0 = time.perf_counter()
plan2 = lanepipe.build_plan(src.astype(np.int64), dst.astype(np.int64),
                            w, n, n)
print(f"mxv-direction plan build {time.perf_counter()-t0:.2f}s")
if plan2 is None:
    print("mxv-direction: PLAN INELIGIBLE (packing) -> sortpipe fallback")
else:
    print(f"mxv L={plan2['L']} ({plan2['L']/nnz:.2f}x) G pack "
          f"{plan2['R_g']*128/nnz:.2f}x")

if os.environ.get("PLAN_ONLY"):
    sys.exit(0)

import jax  # noqa: E402

import graphblas_tpu as gb  # noqa: E402

print("backend:", jax.default_backend())
with gb.config.set(auto_sparse_limit=0):
    A = gb.Matrix.from_coo(src, dst, w, dtype="FP32", nrows=n, ncols=n)
    A.wait(how="complete")
ring = gb.semiring.plus_times["FP32"]
rank = gb.Vector.from_dense(np.full(n, 1.0 / n, np.float32))
y = gb.Vector(gb.dtypes.FP32, n)

t0 = time.perf_counter()
y << rank.vxm(A, ring)
y.wait(how="complete")
print(f"compile+first {time.perf_counter()-t0:.1f}s")

for trial in range(3):
    t0 = time.perf_counter()
    iters = 20
    for _ in range(iters):
        y << rank.vxm(A, ring)
    y.wait(how="complete")
    dt = (time.perf_counter() - t0) / iters
    print(f"steady {dt*1e3:.3f} ms/iter = {nnz/dt/1e9:.2f} GnnZ/s")

# correctness vs host
yy = np.zeros(n, np.float64)
np.add.at(yy, dst, w * (1.0 / n))
got = np.asarray(y.to_coo()[1])
print("max err:", np.abs(got - yy).max())
