"""Distributed semiring SpMV over row-block CSR with explicit collectives.

The layout follows the BASELINE.json north star: the adjacency matrix is
row-block partitioned over the mesh (one CSR block per device, nnz-capacity
padded so shapes are static), the frontier/rank vector is sharded over the
same axis, and each step all-gathers the vector over ICI inside a
``shard_map`` kernel, computes the local semiring SpMV edge-parallel (gather
+ segment-reduce, which XLA lays out well on TPU; a Pallas kernel can
specialize this further), and leaves the result sharded.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

__all__ = ["make_blocked_csr", "dist_mxv", "dist_bfs_step", "dist_pagerank_step"]


class BlockedCSR:
    """Row-block CSR: per-device (rowids, cols, vals, edge_ok) + shapes.

    Padded to a common nnz capacity per block; `rowids` are block-local.
    """

    __slots__ = ("rowids", "cols", "vals", "edge_ok", "n", "rows_per",
                 "n_blocks", "nnz", "mesh", "axis")

    def __init__(self, rowids, cols, vals, edge_ok, n, rows_per, nnz, mesh, axis):
        self.rowids = rowids
        self.cols = cols
        self.vals = vals
        self.edge_ok = edge_ok
        self.n = n
        self.rows_per = rows_per
        self.n_blocks = rowids.shape[0]
        self.nnz = nnz
        self.mesh = mesh
        self.axis = axis


def make_blocked_csr(A, mesh, *, axis=None, dtype=np.float32):
    """Partition a gb.Matrix (or (rows, cols, vals, n) tuple) into row blocks
    sharded over the first mesh axis."""
    if axis is None:
        axis = mesh.axis_names[0]
    n_blocks = mesh.shape[axis]
    if isinstance(A, tuple):
        r, c, v, n = A
    else:
        r, c, v = A.to_coo()
        n = A.nrows
    r = np.asarray(r, np.int64)
    c = np.asarray(c, np.int64)
    v = np.asarray(v, dtype)
    if n % n_blocks:
        n_pad = (-n) % n_blocks
        n = n + n_pad
    rows_per = n // n_blocks
    blk = r // rows_per
    order = np.lexsort((c, r))
    r, c, v, blk = r[order], c[order], v[order], blk[order]
    counts = np.bincount(blk, minlength=n_blocks)
    cap = int(counts.max()) if len(counts) else 1
    cap = max(cap, 1)
    rowids = np.zeros((n_blocks, cap), np.int32)
    cols = np.zeros((n_blocks, cap), np.int32)
    vals = np.zeros((n_blocks, cap), dtype)
    edge_ok = np.zeros((n_blocks, cap), bool)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for b in range(n_blocks):
        s, e = starts[b], starts[b + 1]
        m = e - s
        rowids[b, :m] = (r[s:e] - b * rows_per).astype(np.int32)
        cols[b, :m] = c[s:e].astype(np.int32)
        vals[b, :m] = v[s:e]
        edge_ok[b, :m] = True
    sh = NamedSharding(mesh, P(axis, None))
    return BlockedCSR(
        jax.device_put(jnp.asarray(rowids), sh),
        jax.device_put(jnp.asarray(cols), sh),
        jax.device_put(jnp.asarray(vals), sh),
        jax.device_put(jnp.asarray(edge_ok), sh),
        n, rows_per, int(len(r)), mesh, axis,
    )


_MONOID_SEG = {
    "plus": (jax.ops.segment_sum, 0.0),
    "min": (jax.ops.segment_min, np.inf),
    "max": (jax.ops.segment_max, -np.inf),
    "lor": (jax.ops.segment_max, 0),
    "any": (jax.ops.segment_max, 0),
}

_MULT = {
    "times": lambda a, x: a * x,
    "plus": lambda a, x: a + x,
    "first": lambda a, x: a,
    "second": lambda a, x: x,
    "pair": lambda a, x: jnp.ones_like(x),
    "land": lambda a, x: a * x,
}


def _local_spmv(rowids, cols, vals, edge_ok, x_full, rows_per, ring):
    add_name, mult_name = ring.split("_", 1)
    seg, ident = _MONOID_SEG[add_name]
    mult = _MULT[mult_name]
    xg = jnp.take(x_full, cols, axis=0)
    prods = mult(vals, xg)
    prods = jnp.where(edge_ok, prods, jnp.array(ident, prods.dtype))
    y = seg(prods, rowids, num_segments=rows_per)
    present = jax.ops.segment_max(edge_ok.astype(jnp.int32), rowids,
                                  num_segments=rows_per)
    return y, present.astype(bool)


def dist_mxv(blocked, x, ring="plus_times"):
    """y = A (ring) x with A row-block sharded and x sharded over rows.

    x: jnp array (n,) sharded P(axis).  Returns y sharded P(axis).
    All-gather of x happens inside the shard_map kernel (ICI collective).
    """
    mesh = blocked.mesh
    axis = blocked.axis
    rows_per = blocked.rows_per

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis, None), P(axis, None), P(axis, None),
                       P(axis, None), P(axis)),
             out_specs=(P(axis), P(axis)))
    def kernel(rowids, cols, vals, edge_ok, x_blk):
        x_full = jax.lax.all_gather(x_blk, axis, tiled=True)
        y, present = _local_spmv(rowids[0], cols[0], vals[0], edge_ok[0],
                                 x_full, rows_per, ring)
        return y, present

    return kernel(blocked.rowids, blocked.cols, blocked.vals, blocked.edge_ok, x)


def dist_bfs_step(blocked, frontier, visited, levels, depth):
    """One level-BFS step, fully sharded.

    frontier/visited: bool (n,) sharded; levels: int32 (n,) sharded.
    Returns (new_frontier, new_visited, new_levels, frontier_nonempty).
    """
    levels = jnp.where(frontier, depth, levels)
    visited = visited | frontier
    y, present = dist_mxv(blocked, frontier.astype(jnp.float32), "lor_second")
    new_frontier = present & (y > 0) & ~visited
    any_left = jnp.any(new_frontier)
    return new_frontier, visited, levels, any_left


def dist_pagerank_step(blocked, r, inv_outdeg, damping, base):
    """One PageRank iteration: r' = damping * A^T-style propagate + base."""
    contrib = r * inv_outdeg
    y, present = dist_mxv(blocked, contrib, "plus_times")
    return damping * y + base
