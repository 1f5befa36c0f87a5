"""Static-permutation executor: TPU-native replacement for global lax.sort.

The lanepipe engine's route/extract steps apply a *fixed* permutation of an
L-element array (L multiple of 16384), known at plan time.  Through round 4
they ran as permutation-keyed ``lax.sort`` (~42 ms at 9.4M elements on the
round-4 chip probe).  This module executes the same movement in ~0.6 ms by
decomposing any permutation into TPU-friendly stages (a rearrangeable
3-stage Clos network over (128,128) tiles):

    stage A : independent within-tile permutations   (Pallas, lane gathers)
    exchange: (T, 16384) -> (16384, T) transpose     (XLA, ~bandwidth)
    stage B : independent within-row permutations    (Pallas)
    exchange: transpose back                         (XLA)
    stage C : independent within-tile permutations   (Pallas)

Tiles hold n=16384 elements; rows of the exchanged array hold T = L/16384
ports.  Clos routing: color each element c in [0, n) such that colors are
distinct within every source tile and every destination tile (Konig edge
coloring of the T x T tile multigraph, computed by Euler splitting in
native/permplan.cpp).  Element p goes to slot c of its source tile (stage
A), rides the transpose to row c, moves to port dest_tile(p) within row c
(stage B, collision-free by the coloring), rides the transpose back, and
lands at its final in-tile position (stage C).

Within-tile permutations decompose the same way one level down (3-phase
mesh routing on the (128,128) grid: lane gather, transpose, lane gather,
transpose, lane gather), because the only arbitrary-range gather this TPU
generation executes at speed is the same-shape *lane* gather
(tpu.dynamic_gather along dim 1; sublane gather does not lower).  All
index arrays are precomputed on the host and packed 3x7 bits into one i32
per element.

The reference delegates this data movement to SuiteSparse kernel internals
(reference graphblas/core/ss/descriptor.py axb_method); there is no
reference analog for any of this code.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ... import native

N_TILE = 16384  # elements per Clos block = one (128,128) memory tile

# test hook mirrored from lanepipe: run Pallas kernels in interpret mode
_INTERPRET = False


def _use_pallas():
    return _INTERPRET or jax.default_backend() == "tpu"


# --------------------------------------------------------------------- #
# plan construction (host)
def build_perm_plan(pi):
    """Plan the movement out[pi[p]] = in[p] for a permutation pi of [0, L).

    L must be a multiple of 16384.  Returns a dict of host numpy arrays:
    packed_A/packed_C: (L//128, 128) i32; packed_B: (16384, T_pad) i32,
    plus static geometry.  Convert to device arrays with plan_to_device.
    """
    pi = np.asarray(pi)
    L = len(pi)
    if L % N_TILE != 0:
        raise ValueError(f"L={L} not a multiple of {N_TILE}")
    n = N_TILE
    T = L // n
    p = np.arange(L, dtype=np.int64)
    q = pi.astype(np.int64)
    b = (p >> 14).astype(np.int32)
    B = (q >> 14).astype(np.int32)

    # level-1 coloring: distinct within src tile and dst tile
    if T == 1:
        # single tile: the final position is itself a valid color; stages
        # B/C degenerate to identities
        c = q.copy()
    else:
        c = native.clos_color(b, B, np.array([0, L], np.int64), T, n)
        c = c.astype(np.int64)

    # ---- stage A: within src tile b, move pos -> c
    i = (p >> 7) & 127
    j = p & 127
    ic = c >> 7
    jc = c & 127
    offs_tiles = np.arange(T + 1, dtype=np.int64) * n
    mu = native.clos_color(i.astype(np.int32), ic.astype(np.int32),
                           offs_tiles, 128, 128).astype(np.int64)
    a_idx = np.empty((T, 128, 128), np.int32)
    a_idx[b, i, mu] = j
    b_idx = np.empty((T, 128, 128), np.int32)
    b_idx[b, mu, ic] = i
    c_idx = np.empty((T, 128, 128), np.int32)
    c_idx[b, ic, jc] = mu
    packed_A = (a_idx | (b_idx << 7) | (c_idx << 14)).reshape(L // 128, 128)

    # ---- stage B: element at (row c, port b) moves to port B; rows padded
    # to T_pad ports with identity dummies
    T_pad = max(128, -(-T // 128) * 128)
    T128 = T_pad // 128
    nd = T_pad - T
    if nd:
        dummy_rows = np.repeat(np.arange(n, dtype=np.int64), nd)
        dummy_ports = np.tile(np.arange(T, T_pad, dtype=np.int64), n)
        rows_all = np.concatenate([c, dummy_rows])
        port_all = np.concatenate([b.astype(np.int64), dummy_ports])
        dest_all = np.concatenate([B.astype(np.int64), dummy_ports])
    else:
        rows_all = c
        port_all = b.astype(np.int64)
        dest_all = B.astype(np.int64)
    order = np.argsort(rows_all, kind="stable")
    rows_s = rows_all[order]
    port_s = port_all[order]
    dest_s = dest_all[order]
    a_sub = (port_s >> 7).astype(np.int32)
    l_s = (port_s & 127).astype(np.int32)
    A2 = (dest_s >> 7).astype(np.int32)
    l2 = (dest_s & 127).astype(np.int64)
    if T128 == 1:
        # one subtile per row: the port itself is a valid color (a row's
        # ports are a permutation of [0, 128))
        nu = port_s.astype(np.int64)
    else:
        offs_rows = np.arange(n + 1, dtype=np.int64) * T_pad
        nu = native.clos_color(a_sub, A2, offs_rows, T128, 128)
        nu = nu.astype(np.int64)
    a_sub = a_sub.astype(np.int64)
    A2 = A2.astype(np.int64)
    rbase = rows_s * T_pad
    b1 = np.empty((n, T128, 128), np.int32)
    b1.reshape(-1)[rbase + (a_sub << 7) + nu] = l_s
    b3 = np.empty((n, T128, 128), np.int32)
    b3.reshape(-1)[rbase + (A2 << 7) + l2] = nu
    bsel = np.empty((n, T128, 128), np.int32)
    bsel.reshape(-1)[rbase + (A2 << 7) + nu] = a_sub
    packed_B = (b1 | (b3 << 7) | (bsel << 14)).reshape(n, T_pad)

    # ---- stage C: within dst tile B, move pos c -> q % n
    order2 = np.argsort(B, kind="stable")
    BB = B[order2].astype(np.int64)
    cc = c[order2]
    qq = q[order2] & (n - 1)
    i2 = cc >> 7
    j2 = cc & 127
    i2p = qq >> 7
    j2p = qq & 127
    mu2 = native.clos_color(i2.astype(np.int32), i2p.astype(np.int32),
                            offs_tiles, 128, 128).astype(np.int64)
    cbase = BB << 14
    a2 = np.empty((T, 128, 128), np.int32)
    a2.reshape(-1)[cbase + (i2 << 7) + mu2] = j2
    b2 = np.empty((T, 128, 128), np.int32)
    b2.reshape(-1)[cbase + (mu2 << 7) + i2p] = i2
    c2 = np.empty((T, 128, 128), np.int32)
    c2.reshape(-1)[cbase + (i2p << 7) + j2p] = mu2
    packed_C = (a2 | (b2 << 7) | (c2 << 14)).reshape(L // 128, 128)

    return {"L": L, "T": T, "T_pad": T_pad, "T128": T128,
            "packed_A": packed_A, "packed_B": packed_B,
            "packed_C": packed_C}


def plan_to_device(plan):
    meta = {k: plan[k] for k in ("L", "T", "T_pad", "T128")}
    dev = tuple(jnp.asarray(plan[k])
                for k in ("packed_A", "packed_B", "packed_C"))
    return meta, dev


# --------------------------------------------------------------------- #
# device execution
def _tile_perm_xla(x3, p3):
    """x3, p3: (T, 128, 128); apply packed within-tile perms."""
    y = jnp.take_along_axis(x3, p3 & 127, axis=2)
    y = y.swapaxes(1, 2)
    y = jnp.take_along_axis(y, (p3 >> 7) & 127, axis=2)
    y = y.swapaxes(1, 2)
    return jnp.take_along_axis(y, (p3 >> 14) & 127, axis=2)


def _mid_perm_xla(y3, p3):
    """y3, p3: (16384, T128, 128); apply packed within-row perms."""
    z = jnp.take_along_axis(y3, p3 & 127, axis=2)
    z = jnp.take_along_axis(z, (p3 >> 14) & 127, axis=1)
    return jnp.take_along_axis(z, (p3 >> 7) & 127, axis=2)


def _apply_xla(meta, dev, arrs):
    T, T_pad, T128 = meta["T"], meta["T_pad"], meta["T128"]
    pa, pb, pc = dev
    pa3 = pa.reshape(T, 128, 128)
    pb3 = pb.reshape(N_TILE, T128, 128)
    pc3 = pc.reshape(T, 128, 128)
    outs = []
    for x in arrs:
        y = _tile_perm_xla(x.reshape(T, 128, 128), pa3)
        y = y.reshape(T, N_TILE).T
        if T_pad > T:
            y = jnp.pad(y, ((0, 0), (0, T_pad - T)))
        y = _mid_perm_xla(y.reshape(N_TILE, T128, 128), pb3)
        y = y.reshape(N_TILE, T_pad)[:, :T].T
        y = _tile_perm_xla(y.reshape(T, 128, 128), pc3)
        outs.append(y.reshape(-1, 128))
    return outs


# Pallas kernels -------------------------------------------------------- #
_BR_TP = 512  # sublanes per tile-perm grid step (4 tiles)


def _tile_perm_body(x, idx):
    y = jnp.take_along_axis(x, idx & 127, axis=1)
    y = y.T
    y = jnp.take_along_axis(y, (idx >> 7) & 127, axis=1)
    y = y.T
    return jnp.take_along_axis(y, (idx >> 14) & 127, axis=1)


def _tile_perm_pallas(p, nch_arrs, interpret):
    """Apply within-tile perms to each array in nch_arrs ((R,128) each)."""
    from jax.experimental import pallas as pl

    arrs = list(nch_arrs)
    R = arrs[0].shape[0]
    nch = len(arrs)
    BR = _BR_TP if R % _BR_TP == 0 else 128

    def kernel(*refs):
        p_ref = refs[0]
        in_refs = refs[1:1 + nch]
        out_refs = refs[1 + nch:]
        for s in range(BR // 128):
            sl = slice(s * 128, (s + 1) * 128)
            idx = p_ref[sl, :]
            for a in range(nch):
                out_refs[a][sl, :] = _tile_perm_body(in_refs[a][sl, :], idx)

    spec = pl.BlockSpec((BR, 128), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[spec] * (1 + nch),
        out_specs=tuple([spec] * nch) if nch > 1 else spec,
        out_shape=tuple(jax.ShapeDtypeStruct((R, 128), a.dtype)
                        for a in arrs) if nch > 1
        else jax.ShapeDtypeStruct((R, 128), arrs[0].dtype),
        interpret=interpret,
    )(p, *arrs)


def _mid_perm_pallas(p, arrs, T128, T_pad, interpret, out_T=None):
    """Apply within-row perms.

    Input arrays are (16384, T) with T <= T_pad: the pad columns (the
    plan's identity dummies) are materialized in VMEM inside the kernel,
    and dropped again on output — real elements never reference pad
    positions (their ports are all < T), so no HBM pad/slice copies are
    needed around this stage.

    out_T: only destination ports < out_T are needed (the lanepipe
    extract's out_limit trimming) — output port groups beyond it are
    neither computed nor written, and the returned arrays are
    (16384, out_T)."""
    from jax.experimental import pallas as pl

    nch = len(arrs)
    T = arrs[0].shape[1]
    TW = T if out_T is None else min(T, out_T)

    def kernel(*refs):
        p_ref = refs[0]
        in_refs = refs[1:1 + nch]
        out_refs = refs[1 + nch:]
        for a_i in range(nch):
            y = in_refs[a_i][...]
            if T < T_pad:
                y = jnp.concatenate(
                    [y, jnp.zeros((128, T_pad - T), y.dtype)], axis=1)
            subs = []
            for a in range(T128):
                sl = slice(a * 128, (a + 1) * 128)
                idx = p_ref[:, sl]
                subs.append(jnp.take_along_axis(y[:, sl], idx & 127,
                                                axis=1))
            for A2 in range(T128):
                lo = A2 * 128
                if lo >= TW:
                    continue  # pad-only or trimmed column group
                sl = slice(A2 * 128, (A2 + 1) * 128)
                idx = p_ref[:, sl]
                sel = (idx >> 14) & 127
                acc = subs[0]
                for a in range(1, T128):
                    acc = jnp.where(sel == a, subs[a], acc)
                z = jnp.take_along_axis(acc, (idx >> 7) & 127, axis=1)
                if lo + 128 <= TW:
                    out_refs[a_i][:, lo:lo + 128] = z
                else:
                    out_refs[a_i][:, lo:TW] = z[:, :TW - lo]

    pspec = pl.BlockSpec((128, T_pad), lambda i: (i, 0))
    dspec = pl.BlockSpec((128, T), lambda i: (i, 0))
    ospec = pl.BlockSpec((128, TW), lambda i: (i, 0))
    return pl.pallas_call(
        kernel,
        grid=(N_TILE // 128,),
        in_specs=[pspec] + [dspec] * nch,
        out_specs=tuple([ospec] * nch) if nch > 1 else ospec,
        out_shape=tuple(jax.ShapeDtypeStruct((N_TILE, TW), a.dtype)
                        for a in arrs) if nch > 1
        else jax.ShapeDtypeStruct((N_TILE, TW), arrs[0].dtype),
        interpret=interpret,
    )(p, *arrs)


def apply_perm(meta, dev, arrs, *, use_pallas=None, interpret=None,
               out_limit=None, skip_a=False):
    """Permute each (R,128) array in arrs by the planned permutation.

    Returns a list of (R,128) arrays with out[pi[p]] = in[p] flatwise.
    out_limit: only the first out_limit flat outputs are needed — stage C
    (and the second exchange) run only over the destination tiles that
    cover them, and the returned arrays have ceil(out_limit/16384)*128
    rows.  Used by the lanepipe extract step, whose useful outputs (the
    destination totals) are a small prefix of the permutation domain.
    skip_a: the caller already applied stage A (the lanepipe gather
    kernel folds it into its output write); Pallas path only.
    """
    if use_pallas is None:
        use_pallas = _use_pallas()
    if interpret is None:
        interpret = _INTERPRET
    T, T_pad, T128 = meta["T"], meta["T_pad"], meta["T128"]
    TV = T if out_limit is None else min(T, -(-out_limit // N_TILE))
    if not use_pallas:
        assert not skip_a
        outs = _apply_xla(meta, dev, arrs)
        if TV < T:
            outs = [o[:TV * 128] for o in outs]
        return outs
    pa, pb, pc = dev
    if skip_a:
        ys = list(arrs)
    else:
        ys = _tile_perm_pallas(pa, arrs, interpret)
    if len(arrs) == 1 and not skip_a:
        ys = [ys]
    mids = [y.reshape(T, N_TILE).T for y in ys]
    zs = _mid_perm_pallas(pb, mids, T128, T_pad, interpret,
                          out_T=None if TV == T else TV)
    if len(arrs) == 1:
        zs = [zs]
    fin = [z.T.reshape(-1, 128) for z in zs]
    pcv = pc[:TV * 128] if TV < T else pc
    outs = _tile_perm_pallas(pcv, fin, interpret)
    if len(arrs) == 1:
        outs = [outs]
    return list(outs)


def apply_perm_pre_c(meta, dev, arrs, *, interpret=None, skip_a=False):
    """Run stages A/exchange/B/exchange of the permutation, returning the
    (R,128) arrays that stage C would consume (tile t = destination tile
    t's arrival layout).  Pallas path only — used by the lanepipe's fused
    routeC+scan+extractA kernel.  skip_a: stage A was already applied by
    the caller (the gather kernel folds it into its output write)."""
    if interpret is None:
        interpret = _INTERPRET
    T, T_pad, T128 = meta["T"], meta["T_pad"], meta["T128"]
    pa, pb, pc = dev
    if skip_a:
        ys = list(arrs)
    else:
        ys = _tile_perm_pallas(pa, arrs, interpret)
    if len(arrs) == 1 and not skip_a:
        ys = [ys]
    mids = [y.reshape(T, N_TILE).T for y in ys]
    zs = _mid_perm_pallas(pb, mids, T128, T_pad, interpret)
    if len(arrs) == 1:
        zs = [zs]
    return [z.T.reshape(-1, 128) for z in zs]


def apply_perm_post_a(meta, dev, arrs, *, interpret=None, out_limit=None):
    """Run exchange/B/exchange/C of the permutation, taking arrays that
    stage A already produced (the lanepipe's fused kernel applies stage A
    of the extract permutation inside the scan)."""
    if interpret is None:
        interpret = _INTERPRET
    T, T_pad, T128 = meta["T"], meta["T_pad"], meta["T128"]
    TV = T if out_limit is None else min(T, -(-out_limit // N_TILE))
    pa, pb, pc = dev
    mids = [y.reshape(T, N_TILE).T for y in arrs]
    zs = _mid_perm_pallas(pb, mids, T128, T_pad, interpret,
                          out_T=None if TV == T else TV)
    if len(arrs) == 1:
        zs = [zs]
    fin = [z.T.reshape(-1, 128) for z in zs]
    pcv = pc[:TV * 128] if TV < T else pc
    outs = _tile_perm_pallas(pcv, fin, interpret)
    if len(arrs) == 1:
        outs = [outs]
    return list(outs)
