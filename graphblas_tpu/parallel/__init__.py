"""Multi-chip distribution: mesh-sharded matrices + collective semiring ops.

The reference has no distributed backend (SURVEY §2.9) — its parallelism is
OpenMP threads inside one process.  This package is the TPU-native equivalent
the blueprint calls for: adjacency matrices sharded over a
``jax.sharding.Mesh`` (1D row-block or 2D block partition), vectors sharded/
replicated with ``NamedSharding``, and semiring SpMV/SpGEMM expressed through
``shard_map`` with explicit XLA collectives (psum-style monoid reductions over
the contraction axis, all-gather of frontier vectors) riding ICI.

Two usage levels:
1. Transparent GSPMD: `shard_matrix`/`shard_vector` place the bitmap stores
   with shardings; the regular fused engine kernels then run SPMD under jit
   with compiler-inserted collectives.
2. Explicit shard_map kernels (spmv.py): per-device blocks + hand-placed
   collectives, used by the distributed algorithm steps and the multi-chip
   dry run.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .spmv import (
    BlockedCSR,
    dist_bfs_step,
    dist_mxv,
    dist_mxv_ring,
    dist_pagerank_step,
    make_blocked_csr,
)

__all__ = [
    "make_mesh",
    "shard_matrix",
    "shard_vector",
    "replicate",
    "dist_mxv",
    "dist_mxv_ring",
    "BlockedCSR",
    "dist_bfs_step",
    "dist_pagerank_step",
    "make_blocked_csr",
    "Mesh",
    "P",
]


def make_mesh(shape=None, axis_names=None, *, devices=None):
    """Create a device mesh.  Default: 1D mesh over all devices, axis 'i'."""
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),)
    if axis_names is None:
        axis_names = ("i", "j")[: len(shape)]
    arr = np.array(devices).reshape(shape)
    return Mesh(arr, axis_names)


def shard_matrix(A, mesh, spec=None):
    """Distribute a Matrix over the mesh (row-block by default).

    Sparse-backed matrices get a row-block-sharded :class:`BlockedCSR`
    attached (``A._dist``); mxv/vxm dispatch then runs the distributed
    typed-semiring kernel (spmv.py) with explicit collectives, while the
    sparse store stays authoritative for everything else (VERDICT r2 #5).
    Dense-backed matrices are placed with a NamedSharding and run SPMD
    under GSPMD.  Row dimension must divide evenly by the mesh axis size
    for the dense path (pad with `A.resize` first if needed).
    """
    if A._sparse is not None and spec is None:
        A._dist = make_blocked_csr(A, mesh)
        return A
    if spec is None:
        spec = P(mesh.axis_names[0], None)
    sh = NamedSharding(mesh, spec)
    A._set_store(jax.device_put(A._vals, sh), jax.device_put(A._valid, sh))
    return A


def shard_vector(v, mesh, spec=None):
    """Shard a Vector over the first mesh axis (or replicate with P())."""
    if spec is None:
        spec = P(mesh.axis_names[0])
    sh = NamedSharding(mesh, spec)
    v._set_store(jax.device_put(v._vals, sh), jax.device_put(v._valid, sh))
    return v


def replicate(v, mesh):
    return shard_vector(v, mesh, P())


def ewise_blocked(A, B, op, *, variant="mult", name=None):
    """Aligned-shard elementwise over two identically-structured
    shard_matrix()-ed matrices: the blocked value arrays combine SPMD over
    the mesh (no communication), and the result carries both a sparse
    store and a BlockedCSR sharing the index arrays (parallel/ops.py;
    VERDICT r3 item #5 "aligned-shard ewise").
    """
    from ..core.matrix import Matrix
    from ..core.operator.utils import get_typed_op
    from .ops import dist_ewise_same_structure

    if getattr(A, "_dist", None) is None or getattr(B, "_dist", None) is None:
        raise ValueError("ewise_blocked requires shard_matrix()-ed operands")
    if A._sparse is None or B._sparse is None or             A._sparse.token != B._sparse.token:
        raise ValueError("ewise_blocked requires identical structure "
                         "(same-build matrices); use ewise_add/mult for "
                         "the general case")
    typed = get_typed_op(op, A.dtype, B.dtype, kind="binary")
    expr = A.ewise_mult(B, typed) if variant == "mult" else         A.ewise_add(B, typed)
    out = expr.new(name=name)
    out._dist = dist_ewise_same_structure(A._dist, B._dist, typed, A.dtype,
                                          B.dtype, typed.return_type)
    return out


# scoped 64-bit mode over module entry points (core/utils.py:x64_func)
from ..core.utils import x64_func as _x64_func  # noqa: E402
shard_matrix = _x64_func(shard_matrix)
shard_vector = _x64_func(shard_vector)
replicate = _x64_func(replicate)
ewise_blocked = _x64_func(ewise_blocked)
