"""Pallas TPU kernel: blocked tropical semiring matmul.

C[i,j] = reduce_k ( A[i,k] (+) B[k,j] ) for (reduce, combine) in
{(min,plus), (max,plus), (min,max), (max,min)} — the semirings the MXU can't
express (no multiply-accumulate), implemented as a VPU broadcast-combine per
k-slice over MXU-shaped tiles.  Missing entries are encoded as the reduce
identity (+inf / -inf) so masking is free.

Replaces the reference's reliance on SuiteSparse SpGEMM heuristics for
min_plus (`axb_method`, core/ss/descriptor.py:74-80) with a TPU-shaped dense
block kernel; the blocked generic scan path in engine/dense.py is the
fallback for everything else.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

_COMBINE = {
    "plus": lambda a, b: a + b,
    "min": jnp.minimum,
    "max": jnp.maximum,
    "times": lambda a, b: a * b,
    "first": lambda a, b: a,
    "second": lambda a, b: b,
}
_REDUCE = {
    "min": (jnp.minimum, np.inf),
    "max": (jnp.maximum, -np.inf),
}

_BM = 256
_BN = 256
_BK = 128


def _kernel(a_ref, b_ref, o_ref, *, reduce_name, combine_name, bk, nsteps):
    from jax.experimental import pallas as pl

    red, ident = _REDUCE[reduce_name]
    comb = _COMBINE[combine_name]

    @pl.when(pl.program_id(2) == 0)
    def _():
        o_ref[:, :] = jnp.full(o_ref.shape, ident, o_ref.dtype)

    a = a_ref[:, :]  # (BM, BK)
    b = b_ref[:, :]  # (BK, BN)

    def body(k, acc):
        # one k-slice: outer combine (BM,1)+(1,BN) on the VPU, then reduce
        return red(acc, comb(a[:, k][:, None], b[k, :][None, :]))

    acc = jax.lax.fori_loop(0, bk, body, o_ref[:, :])
    o_ref[:, :] = acc


@functools.partial(jax.jit, static_argnames=("reduce_name", "combine_name"))
def tropical_matmul(a, b, reduce_name="min", combine_name="plus"):
    """Dense tropical matmul with identity-encoded missing entries.

    a: (m, k), b: (k, n) float32/float64.  Returns (m, n).
    """
    from jax.experimental import pallas as pl

    m, k = a.shape
    n = b.shape[1]
    red, ident = _REDUCE[reduce_name]
    bm, bn, bk = min(_BM, m), min(_BN, n), min(_BK, k)

    def pad_to(x, d0, d1):
        p0 = (-x.shape[0]) % d0
        p1 = (-x.shape[1]) % d1
        if p0 or p1:
            x = jnp.pad(x, ((0, p0), (0, p1)), constant_values=ident)
        return x

    a = pad_to(a, bm, bk)
    b = pad_to(b, bk, bn)
    mp, kp = a.shape
    np_ = b.shape[1]
    grid = (mp // bm, np_ // bn, kp // bk)

    out = pl.pallas_call(
        functools.partial(_kernel, reduce_name=reduce_name,
                          combine_name=combine_name, bk=bk, nsteps=grid[2]),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk)),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j)),
        out_shape=jax.ShapeDtypeStruct((mp, np_), a.dtype),
    )(a, b)
    return out[:m, :n]


def tropical_matmul_reference(a, b, reduce_name="min", combine_name="plus"):
    """Pure-XLA lowering (fallback + correctness oracle for the kernel)."""
    red, ident = _REDUCE[reduce_name]
    comb = _COMBINE[combine_name]
    # blocked over k to bound the (m, bk, n) intermediate
    m, k = a.shape
    n = b.shape[1]
    bk = max(1, min(k, (1 << 22) // max(1, m * n)))
    nblocks = -(-k // bk)
    kp = nblocks * bk
    a = jnp.pad(a, ((0, 0), (0, kp - k)), constant_values=ident)
    b = jnp.pad(b, ((0, kp - k), (0, 0)), constant_values=ident)

    def body(carry, idx):
        a_blk = jax.lax.dynamic_slice_in_dim(a, idx * bk, bk, 1)
        b_blk = jax.lax.dynamic_slice_in_dim(b, idx * bk, bk, 0)
        pv = comb(a_blk[:, :, None], b_blk[None, :, :])
        return red(carry, pv.min(axis=1) if reduce_name == "min"
                   else pv.max(axis=1)), None

    init = jnp.full((m, n), ident, a.dtype)
    out, _ = jax.lax.scan(body, init, jnp.arange(nblocks))
    return out


def available():
    """True when the current default backend can run these kernels compiled."""
    import jax

    return jax.default_backend() == "tpu"
