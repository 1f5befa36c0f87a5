"""Lane-aligned SpMV engine: the round-4 TPU hot path for semiring matvec.

Replaces the sort-pipeline's 6 radix sorts per matvec
(core/engine/sortpipe.py) with a static-layout formulation built on the
primitives this TPU generation executes at speed (measured in
tools/ubench_lanepipe.py and tools/probe_tileperm*.py):

- in-register lane gather: ``jnp.take_along_axis(t, ix, axis=1)`` over a
  (128,128) tile (~200 Gelem/s), which combined with VPU transposes
  emulates a *sublane* gather ``t[idx[r,l], l]``;
- 3-stage Clos static permutations (engine/permute.py) for the global
  route/extract data movement (~0.3 ms at 4.3M elements vs ~42 ms for
  the round-4 permutation-keyed ``lax.sort``).

The matvec  out[d] = monoid_k mult(A[d,k], u[k])  becomes:

1. **gather+mult (Pallas, G layout)**: edges are grouped into blocks
   whose contraction indices fall in one 16384-wide aligned window; the
   per-block u-window (128,128) is DMA'd via a scalar-prefetch index map
   and ``u[k]`` is read with two lane gathers through a per-block column
   map (see build_plan's G-layout comment).  Products are computed
   edgewise with the typed multiply and invalid slots forced to the
   monoid identity.
2. **route (static Clos permutation, engine/permute.py)**: products move
   to the S layout — destination-major runs within a plan-chosen lane
   per destination.
3. **reduce (Pallas, S layout)**: a sublane-direction segmented scan per
   lane folds each destination's run with the monoid (sequential block
   carry keeps the fold order deterministic).
4. **extract (static Clos permutation)**: destination totals (at static
   last-of-run slots) compact into natural dest order.

Skew handling: destinations with more than ``SPLIT_DEG`` edges are split
into virtual destinations (bounded lane imbalance on power-law graphs); a
small second scan+extract level recombines them.  The plan builder
measures its own padding and reports ineligibility when packing is poor,
falling back to the sort-pipeline.

This replaces the reference's delegation of SpMV to SuiteSparse's
saxpy/dot kernels (reference graphblas/core/ss/descriptor.py:74-80,
``axb_method``); it is an original TPU formulation with no reference
analog (the reference has no XLA/Pallas code).

Eligibility: 32-bit value dtypes, identity-carrying builtin monoids with a
supported scan combine, non-positional multiplies (same gate as sortpipe)
plus plan-packing quality.
"""


import jax
import jax.numpy as jnp
import numpy as np

from . import dense
from . import permute as pm
from . import sortpipe as sp
from . import store as st

_IDX = jnp.int32

BR_G = 256      # gather-kernel sublanes per block (32768 edge slots)
BR_S = 128      # scan-kernel sublanes per block (7 roll rounds; measured faster than 512's 9 on v5e)
WINDOW_K = 16384  # contraction span per gather block (128 u2 rows x 128)
SPLIT_DEG = 2048  # max edges per (virtual) destination run
PACK_LIMIT = 2.5  # max allowed padded-slots/nnz ratio before fallback

# test hook: run the Pallas kernels in interpret mode on CPU
_INTERPRET = False


def _use_pallas():
    return _INTERPRET or jax.default_backend() == "tpu"


# --------------------------------------------------------------------- #
# plan construction (host numpy, one-time per structure+direction)
def _ceil_to(x, m):
    return -(-x // m) * m


def _run_index(group_ids):
    """Running index within consecutive equal groups of a sorted id array."""
    m = len(group_ids)
    if m == 0:
        return np.zeros(0, np.int64)
    starts = np.r_[0, np.flatnonzero(np.diff(group_ids)) + 1]
    lens = np.diff(np.r_[starts, m])
    return np.arange(m) - np.repeat(starts, lens)


def build_plan(d, k, vals_np, n_out, n_in):
    """Build the static lanepipe plan for edges (d[i], k[i]) with values.

    Returns a dict of numpy arrays (converted to device arrays by the
    caller) or None when packing quality is below PACK_LIMIT.
    """
    m = len(d)
    if m == 0 or n_out == 0 or n_in == 0:
        return None
    d = d.astype(np.int64)
    k = k.astype(np.int64)

    # ---- G layout (round-5 unified window-gather blocks).  Every edge
    # needs u[k]; k = w*16384 + a*128 + b (w = 16384-aligned window,
    # a = window row, b = window column).  A block covers ONE window and
    # carries a column map idx1[a, lane]: within a (block, lane) pair all
    # edges sharing window-row a must reference the SAME column b — i.e.
    # a lane hosts at most one distinct k per window row, with arbitrary
    # multiplicity and free row placement.  The kernel then reads u with
    # two lane gathers (z[a,l] = w[a, idx1[a,l]]; g[r,l] = z[arow[r,l],
    # l]).  Packing becomes layered bin-packing over (distinct-k chunks),
    # which absorbs power-law contraction skew: a hot k costs ONE column
    # slot per lane regardless of multiplicity (the round-4 design needed
    # a separate "uni" block kind for this and still rejected RMAT at a
    # 12.8x padding ratio; this layout packs it at ~1.1x).
    so = np.argsort(k, kind="stable")
    k_s = k[so]
    run_k = _run_index(k_s)
    chunk_in_k = run_k // BR_G
    # chunk boundaries: new k or new chunk within k
    is_start = np.r_[True, (np.diff(k_s) != 0) | (np.diff(chunk_in_k) != 0)]
    chunk_id = np.cumsum(is_start) - 1
    starts = np.flatnonzero(is_start)
    c_k = k_s[starts]
    c_cnt = np.diff(np.r_[starts, m])
    c_w = c_k >> 14
    c_a = (c_k >> 7) & 127
    c_b = c_k & 127
    # rank chunks within (window, a-row) by count desc -> layer j;
    # preferred lane = (j + salt[a]) % 128 spreads heavy layers across
    # lanes, and placement probes nearby lanes before opening a new page
    ordc = np.lexsort((-c_cnt, c_a, c_w))
    key_wa = (c_w[ordc] << 7) | c_a[ordc]
    j_rank = _run_index(key_wa)
    salt = np.random.default_rng(0).permutation(128)
    lane_pref = np.empty(len(c_k), np.int64)
    lane_pref[ordc] = (j_rank + salt[c_a[ordc]]) % 128
    # greedy placement, heaviest layers first within each window: each
    # lane keeps an open page (fill <= BR_G rows, at most one chunk per
    # window-row a); a chunk probes its preferred lane then neighbors,
    # and only opens a fresh page when none of the probes fit — this
    # recovers most of the fragmentation the per-lane formulaic paging
    # left (RMAT packed 1.64x before, ~1.2x with probing)
    ordp = np.lexsort((j_rank, c_w[ordc]))
    seq = ordc[ordp]  # chunk ids grouped by window, layer asc
    page = np.empty(len(c_k), np.int64)
    lane_c = np.empty(len(c_k), np.int64)
    rowfill = np.empty(len(c_k), np.int64)
    uwins, win_of_chunk = np.unique(c_w, return_inverse=True)
    blocks_per_win = np.zeros(len(uwins), np.int64)
    cw_seq = c_w[seq]
    pref_seq = lane_pref[seq]
    cnt_seq = c_cnt[seq]
    a_seq = c_a[seq]
    NPROBE = 16
    pg = fill = abits = None
    cur_w = -1
    for i in range(len(seq)):
        if cw_seq[i] != cur_w:
            cur_w = cw_seq[i]
            pg = [0] * 128
            fill = [0] * 128
            abits = [0] * 128
        cnt = int(cnt_seq[i])
        bit = 1 << int(a_seq[i])
        l0 = int(pref_seq[i])
        placed = -1
        for t in range(NPROBE):
            l = (l0 + t) & 127
            if fill[l] + cnt <= BR_G and not (abits[l] & bit):
                placed = l
                break
        if placed < 0:
            # no open page fits: open a fresh page on the lane with the
            # fewest pages so far (page count per window = max over
            # lanes, so advances must stay balanced)
            placed = min(range(128), key=lambda l_: (pg[l_], -fill[l_]))
            pg[placed] += 1
            fill[placed] = 0
            abits[placed] = 0
        ci = seq[i]
        page[ci] = pg[placed]
        lane_c[ci] = placed
        rowfill[ci] = fill[placed]
        fill[placed] += cnt
        abits[placed] |= bit
    if len(seq):
        np.maximum.at(blocks_per_win, win_of_chunk, page + 1)
    block_base_w = np.r_[0, np.cumsum(blocks_per_win)]
    nblocks_g = max(int(block_base_w[-1]), 1)
    slots_per_block = BR_G * 128
    if nblocks_g * slots_per_block > PACK_LIMIT * m + 4 * slots_per_block:
        return None
    R_g = nblocks_g * BR_G
    L_g = R_g * 128

    meta = np.zeros((nblocks_g, 3), np.int32)
    meta[:, 0] = np.repeat(uwins, blocks_per_win).astype(np.int32) \
        if len(uwins) else 0
    c_blk = block_base_w[win_of_chunk] + page

    idx1_g = np.zeros((nblocks_g * 128, 128), np.int32)
    idx1_g[c_blk * 128 + c_a, lane_c] = c_b
    locidx_g = np.zeros((R_g, 128), np.int32)
    okg = np.zeros((R_g, 128), bool)
    avals_g = np.zeros((R_g, 128), vals_np.dtype)

    # edge slots: chunk rows stacked at rowfill..rowfill+cnt-1
    e_chunk = chunk_id  # per sorted edge
    e_row_in_chunk = np.arange(m) - starts[e_chunk]
    e_sub = rowfill[e_chunk] + e_row_in_chunk
    s_g = ((c_blk[e_chunk] * BR_G + e_sub) * 128 + lane_c[e_chunk])
    gslot = np.empty(m, np.int64)
    gslot[so] = s_g
    locidx_g.reshape(-1)[s_g] = c_a[e_chunk]
    okg.reshape(-1)[gslot] = True
    avals_g.reshape(-1)[gslot] = vals_np

    # ---- S layout: virtual destinations, balanced lanes, dest-major runs.
    deg = np.bincount(d, minlength=n_out)
    nsplit = -(-np.maximum(deg, 1) // SPLIT_DEG)      # vdests per dest (>=1)
    vstart = np.r_[0, np.cumsum(nsplit)]
    V = int(vstart[-1])
    two_level = bool((nsplit > 1).any())

    # split-destination recombination (round-5): instead of a second
    # scan+permute level, split dests' partial totals extract into a tiny
    # APPENDIX region of fixed-width power-of-two groups; the caller
    # tree-reduces each group with the monoid and scatters the handful of
    # results into the output (all XLA, no extra kernel launches — the
    # r4 level-2 tail cost 4 launches on a runtime that charges ~45us
    # per launch).
    L2req = 0
    n_split = W2 = 0
    split_ids = l2_mask = None
    if two_level:
        split_mask_d = nsplit > 1
        split_ids = np.flatnonzero(split_mask_d)
        n_split = len(split_ids)
        W2 = 1 << int(np.ceil(np.log2(int(nsplit.max()))))
        grp_of_dest = np.cumsum(split_mask_d) - 1
        vid_dest = np.repeat(np.arange(n_out), nsplit)
        vid_j = _run_index(vid_dest)
        is_split_v = split_mask_d[vid_dest]
        tgt = np.where(is_split_v,
                       n_out + grp_of_dest[vid_dest] * W2 + vid_j,
                       vid_dest)
        L2req = n_out + n_split * W2
        l2_mask = np.zeros((n_split, W2), bool)
        l2_mask.reshape(-1)[grp_of_dest[vid_dest[is_split_v]] * W2
                            + vid_j[is_split_v]] = True

    # edge -> vdest: within dest, edges numbered 0.. in d-stable order
    od = np.argsort(d, kind="stable")
    run_d = _run_index(d[od])
    vid_edge = np.empty(m, np.int64)
    vid_edge[od] = vstart[d[od]] + run_d // SPLIT_DEG

    # vdest weights (leading barrier slot + its edges)
    vdeg = np.bincount(vid_edge, minlength=V)
    wt = vdeg + 1
    # balance lanes: serpentine assignment of weight-sorted vdests
    ov = np.argsort(wt, kind="stable")[::-1]
    lane_of_v = np.empty(V, np.int64)
    idx = np.arange(V)
    fwd = (idx // 128) % 2 == 0
    lane_of_v[ov] = np.where(fwd, idx % 128, 127 - idx % 128)
    # per-lane order: vdests by vid ascending (keeps dest-major runs)
    olv = np.lexsort((np.arange(V), lane_of_v))  # by lane, then vid
    lane_sorted = lane_of_v[olv]
    # start offset (sublane) of each vdest within its lane
    csum = np.cumsum(wt[olv]) - wt[olv]
    lane_first = np.r_[0, np.flatnonzero(np.diff(lane_sorted)) + 1]
    lane_csum0 = np.zeros(128, np.int64)
    lane_csum0[lane_sorted[lane_first]] = csum[lane_first]
    v_sub0 = np.empty(V, np.int64)
    v_sub0[olv] = csum - lane_csum0[lane_sorted]
    lane_len = np.bincount(lane_of_v, weights=wt, minlength=128).astype(np.int64)
    R_s = int(lane_len.max())

    # round L to 4 Clos tiles (65536) so the fused routeC+scan+extA
    # kernel can run 512-row grid steps (4x fewer steps; the extra slack
    # is < 1.5% of nnz at bench sizes and is filled with junk slots)
    L = _ceil_to(max(L_g, R_s * 128, L2req, 1), 4 * BR_S * 128)
    R_scan = L // 128
    if R_scan * 128 > PACK_LIMIT * (m + V) + 4 * BR_S * 128 * 2:
        return None

    barrier = np.ones((R_scan, 128), bool)  # junk slots isolate themselves
    oks = np.zeros((R_scan, 128), bool)
    ext_rank = np.zeros(R_scan * 128, np.int32)

    # vdest slots: barrier slot at (v_sub0, lane); edges after it
    bar_flat = v_sub0 * 128 + lane_of_v
    # mark non-barrier inside each run: first clear everything in lanes below
    # lane_len, then set barriers
    row_idx = np.arange(R_s)
    in_use = row_idx[:, None] < lane_len[None, :]
    barrier[:R_s][in_use] = False
    barrier.reshape(-1)[bar_flat] = True

    # edge slots: position = vdest start + 1 + running index within vdest
    ovv = np.lexsort((np.arange(m), vid_edge))
    run_v = _run_index(vid_edge[ovv])
    s_sub = np.empty(m, np.int64)
    s_sub[ovv] = v_sub0[vid_edge[ovv]] + 1 + run_v
    sslot = s_sub * 128 + lane_of_v[vid_edge]
    oks.reshape(-1)[sslot] = True
    assert barrier[0].all() or R_s == 0  # lane scan relies on this

    # extraction: last slot of each vdest gets a rank that PLACES the vdest
    # total for the next stage; everything else gets junk ranks above it.
    last_flat = (v_sub0 + wt - 1) * 128 + lane_of_v
    junk = np.ones(R_scan * 128, bool)
    junk[last_flat] = False
    if two_level:
        # ranks must be a full permutation of [0, L): unsplit totals land
        # at their natural dest position, split partials in the appendix,
        # junk fills the unassigned positions first
        ext_rank[last_flat] = tgt.astype(np.int32)
        unassigned = np.setdiff1d(np.arange(L2req, dtype=np.int64), tgt)
        njunk = int(junk.sum())
        fill = np.concatenate(
            [unassigned, L2req + np.arange(njunk - len(unassigned))])
        ext_rank[junk] = fill.astype(np.int32)
    else:
        ext_rank[last_flat] = np.arange(V, dtype=np.int32)
        ext_rank[junk] = V + np.arange(int(junk.sum()), dtype=np.int32)

    # route: gslot(edge) -> sslot(edge); free G slots -> free S slots
    route = np.empty(L, np.int32)
    edge_g = gslot  # already in original edge order
    route[edge_g] = sslot
    gused = np.zeros(L, bool)
    gused[edge_g] = True
    sused = np.zeros(L, bool)
    sused[sslot] = True
    route[~gused] = np.flatnonzero(~sused)

    plan = {
        "R_g": R_g, "L": L, "R_scan": R_scan, "V": V, "n_out": n_out,
        "n_in": n_in, "nblocks_g": nblocks_g, "two_level": two_level,
        "n_split": n_split, "W2": W2, "L2req": L2req,
        "out_ok": deg > 0,
        "meta": meta,
        "idx1_g": idx1_g,
        "locidx_g": locidx_g,
        "okg": okg,
        "avals_g": avals_g,
        "barrier": barrier,
        "oks": oks,
        "ext_rank": ext_rank,
        "route": route,
    }
    if two_level:
        plan.update({"l2_ids": split_ids.astype(np.int32),
                     "l2_mask": l2_mask})
    return plan


# --------------------------------------------------------------------- #
# kernels
def gather_mult(plan_g, u2, u2ok, mult, a_dt, u_dt, mono, *, kind, R_g,
                nblocks, packed=False, full_u=False, permA=None):
    """Pallas gather+mult.

    Default: (prods (R_g,128) z-carrier with identity at invalid slots,
    okp (R_g,128) i32).  packed=True (BOOL monoids) returns a single
    channel of codes 0=invalid / 1+value, so validity rides the value
    through route/scan/extract with no second channel.  full_u=True
    asserts every u element is valid (guarded by the caller's lax.cond)
    and skips the u-validity gather entirely.

    permA: packed stage-A indices of the route permutation ((L//128,128)
    i32; only the first R_g rows are read).  The route's first within-tile
    stage is folded into the output write — tiles beyond R_g*128 (the
    pad-to-L fill) hold one constant, for which a within-tile permutation
    is a no-op, so the downstream route skips its stage A entirely
    (apply_perm(..., skip_a=True)).  Saves one kernel launch and one full
    L-element HBM round trip per matvec.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    wbase, idx1, locidx, okg, avals = plan_g
    z_dt = mono.type
    z_c = sp.carrier_dtype(z_dt.np_type)
    # host literal, not a device array: pallas kernels cannot capture
    # array constants
    ident_c = np.array(mono.identity, z_dt.np_type).astype(np.dtype(z_c))

    def compute(a, g, ok):
        # typed multiply on gathered operands (sortpipe.spmv_pipeline rules)
        x_in = g.astype(u_dt.np_type) if g.dtype != u_dt.np_type else g
        a_in = a.astype(a_dt.np_type) if a.dtype != np.dtype(a_dt.np_type) else a
        if kind == "mxv":
            prods = dense.apply_binop(mult, a_in, a_dt, x_in, u_dt,
                                      context_map=dense._MATMUL_MAP)
        else:
            prods = dense.apply_binop(mult, x_in, u_dt, a_in, a_dt,
                                      context_map=dense._MATMUL_MAP)
        prods = st.cast_values(prods, mult.return_type, z_dt).astype(z_c)
        if packed:
            return jnp.where(ok, prods.astype(jnp.int32) + 1, 0)
        return jnp.where(ok, prods, ident_c)

    with_pa = permA is not None

    def kernel(*refs):
        if with_pa:
            (meta_ref, uwin_ref, uokwin_ref, idx1_ref, loc_ref, okg_ref,
             av_ref, pa_ref, prods_ref, *rest) = refs
        else:
            (meta_ref, uwin_ref, uokwin_ref, idx1_ref, loc_ref, okg_ref,
             av_ref, prods_ref, *rest) = refs
        okp_ref = rest[0] if rest else None
        # z[a, l] = u-window[a, idx1[a, l]]: the one distinct k this lane
        # references at window-row a; then per slot g[r, l] = z[arow, l]
        z = jnp.take_along_axis(uwin_ref[:], idx1_ref[:], axis=1)
        zT = z.T
        if not full_u:
            zo = jnp.take_along_axis(uokwin_ref[:], idx1_ref[:], axis=1)
            zoT = zo.T
        for s in range(BR_G // 128):
            sl = slice(s * 128, (s + 1) * 128)
            arow = loc_ref[sl, :]
            g = jnp.take_along_axis(zT, arow.T, axis=1).T
            if full_u:
                ok = okg_ref[sl, :] != 0
            else:
                go = jnp.take_along_axis(zoT, arow.T, axis=1).T
                ok = (okg_ref[sl, :] != 0) & (go != 0)
            p = compute(av_ref[sl, :], g, ok)
            if with_pa:
                idxA = pa_ref[sl, :]
                p = pm._tile_perm_body(p, idxA)
            prods_ref[sl, :] = p
            if okp_ref is not None:
                h = ok.astype(jnp.int32)
                if with_pa:
                    h = pm._tile_perm_body(h, idxA)
                okp_ref[sl, :] = h

    one_out = packed or full_u
    z_out = jnp.int32 if packed else z_c
    blk = lambda: pl.BlockSpec((BR_G, 128), lambda i, wb: (i, 0))  # noqa: E731
    in_specs = [
        pl.BlockSpec((128, 128), lambda i, wb: (wb[i, 0], 0)),
        pl.BlockSpec((128, 128), lambda i, wb: (wb[i, 0], 0)),
        pl.BlockSpec((128, 128), lambda i, wb: (i, 0)),
        blk(), blk(), blk(),
    ]
    args = [u2, u2ok, idx1, locidx, okg, avals]
    if with_pa:
        in_specs.append(blk())
        args.append(permA)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nblocks,),
        in_specs=in_specs,
        out_specs=blk() if one_out else (blk(), blk()),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R_g, 128), z_out) if one_out
        else (jax.ShapeDtypeStruct((R_g, 128), z_c),
              jax.ShapeDtypeStruct((R_g, 128), jnp.int32)),
        interpret=_INTERPRET,
    )(wbase, *args)
    if one_out:
        return out, None
    return out


def lane_segscan(barrier, vals, ok, combine):
    """Sublane-direction segmented scan per lane with sequential carry.

    barrier/vals/ok: (R,128); segments restart where barrier is set.
    Returns (scanned_vals, scanned_ok) with ok combined by max.  ok=None
    scans the value channel alone (validity statically known or packed
    into the values) and returns (scanned_vals, None)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = barrier.shape[0]
    with_h = ok is not None

    def kernel(b_ref, v_ref, *rest):
        if with_h:
            h_ref, ov_ref, oh_ref, vcar, hcar = rest
        else:
            ov_ref, vcar = rest
        i = pl.program_id(0)
        bb = b_ref[:] != 0
        v = v_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (BR_S, 128), 0)
        vc = jnp.where(i > 0, vcar[0, :], v[0, :])
        first = row == 0
        v = jnp.where(first & ~bb & (i > 0),
                      combine(jnp.broadcast_to(vc.reshape(1, 128),
                                               (BR_S, 128)), v), v)
        if with_h:
            h = h_ref[:]
            hc = jnp.where(i > 0, hcar[0, :], h[0, :])
            h = jnp.where(first & ~bb & (i > 0),
                          jnp.maximum(jnp.broadcast_to(hc.reshape(1, 128),
                                                       (BR_S, 128)), h), h)
        for s in [1 << j for j in range(BR_S.bit_length() - 1)]:
            s32 = jnp.int32(s)
            bsh = pltpu.roll(bb.astype(jnp.int32), s32, 0) != 0
            okm = row >= s
            v = jnp.where(bb | ~okm, v, combine(pltpu.roll(v, s32, 0), v))
            if with_h:
                h = jnp.where(bb | ~okm, h,
                              jnp.maximum(pltpu.roll(h, s32, 0), h))
            bb = bb | (okm & bsh)
        ov_ref[:] = v
        vcar[0, :] = v[BR_S - 1, :]
        if with_h:
            oh_ref[:] = h
            hcar[0, :] = h[BR_S - 1, :]

    spec = lambda: pl.BlockSpec((BR_S, 128), lambda i: (i, 0))  # noqa: E731
    if not with_h:
        out = pl.pallas_call(
            kernel,
            grid=(R // BR_S,),
            in_specs=[spec(), spec()],
            out_specs=spec(),
            out_shape=jax.ShapeDtypeStruct((R, 128), vals.dtype),
            scratch_shapes=[pltpu.VMEM((1, 128), vals.dtype)],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",)),
            interpret=_INTERPRET,
        )(barrier, vals)
        return out, None
    return pl.pallas_call(
        kernel,
        grid=(R // BR_S,),
        in_specs=[spec(), spec(), spec()],
        out_specs=(spec(), spec()),
        out_shape=(jax.ShapeDtypeStruct((R, 128), vals.dtype),
                   jax.ShapeDtypeStruct((R, 128), ok.dtype)),
        scratch_shapes=[pltpu.VMEM((1, 128), vals.dtype),
                        pltpu.VMEM((1, 128), ok.dtype)],
        compiler_params=pltpu.CompilerParams(
            # the per-lane running carry makes grid steps order-dependent
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(barrier, vals, ok)


def fused_permC_scan_permA(pc_route, barrier, pa_ext, vals, combine):
    """Route stage C + segmented scan + extract stage A in ONE kernel.

    All three operate on aligned (128,128) tiles: the route permutation's
    final within-tile stage produces the S-layout tile, the sublane scan
    folds it (sequential carry), and the extract permutation's first
    within-tile stage rearranges the scanned tile for the extract
    exchange.  Fusing them removes two kernel launches and two full HBM
    round trips per matvec.  Single channel (value); the carry crosses
    blocks on the scanned (pre-extract-perm) values."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R = vals.shape[0]
    BR = 512 if R % 512 == 0 else 128  # build_plan rounds L to 4 tiles

    def kernel(pcr_ref, b_ref, pae_ref, v_ref, o_ref, vcar):
        i = pl.program_id(0)
        row = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        first = row == 0
        carry = None
        for t in range(BR // 128):
            sl = slice(t * 128, (t + 1) * 128)
            v = pm._tile_perm_body(v_ref[sl, :], pcr_ref[sl, :])
            bb = b_ref[sl, :] != 0
            if t == 0:
                vc = jnp.where(i > 0, vcar[0, :], v[0, :])
                gate = first & ~bb & (i > 0)
            else:
                vc = carry
                gate = first & ~bb
            v = jnp.where(gate,
                          combine(jnp.broadcast_to(vc.reshape(1, 128),
                                                   (128, 128)), v), v)
            for s in [1 << j for j in range(7)]:
                s32 = jnp.int32(s)
                bsh = pltpu.roll(bb.astype(jnp.int32), s32, 0) != 0
                okm = row >= s
                v = jnp.where(bb | ~okm, v,
                              combine(pltpu.roll(v, s32, 0), v))
                bb = bb | (okm & bsh)
            carry = v[127, :]
            o_ref[sl, :] = pm._tile_perm_body(v, pae_ref[sl, :])
        vcar[0, :] = carry

    spec = lambda: pl.BlockSpec((BR, 128), lambda i: (i, 0))  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[spec(), spec(), spec(), spec()],
        out_specs=spec(),
        out_shape=jax.ShapeDtypeStruct((R, 128), vals.dtype),
        scratch_shapes=[pltpu.VMEM((1, 128), vals.dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=_INTERPRET,
    )(pc_route, barrier, pa_ext, vals)


def _segscan_xla(barrier, vals, ok, combine):
    """CPU/interpret-free fallback: same semantics via associative_scan
    down the sublane axis (per lane)."""
    b = barrier != 0
    if ok is None:
        def comb_v(left, right):
            bl, vl = left
            br, vr = right
            return (bl | br, jnp.where(br, vr, combine(vl, vr)))

        _, v = jax.lax.associative_scan(comb_v, (b, vals), axis=0)
        return v, None

    def comb(left, right):
        bl, vl, hl = left
        br, vr, hr = right
        v = jnp.where(br, vr, combine(vl, vr))
        h = jnp.where(br, hr, jnp.maximum(hl, hr))
        return (bl | br, v, h)

    _, v, h = jax.lax.associative_scan(comb, (b, vals, ok), axis=0)
    return v, h


# --------------------------------------------------------------------- #
# eligibility and plan cache
def eligible(ring, a_dt, u_dt):
    return sp.eligible_spmv(ring, a_dt, u_dt)


def get_plan(spstore, dest_is_row, *, at=False):
    """Cached lanepipe plan on a SparseStore (device arrays)."""
    # ensure_compile_time_eval: get_plan may first run inside an
    # ss.iterate while-body trace; without it the cached device arrays
    # would be tracers and leak into later traces
    with jax.ensure_compile_time_eval(), jax.enable_x64(True):
        return _get_plan(spstore, dest_is_row, at=at)


def _get_plan(spstore, dest_is_row, *, at=False):
    if at:
        dest_is_row = not dest_is_row
    plans = getattr(spstore, "_lanepipe_plans", None)
    if plans is None:
        plans = {}
        spstore._lanepipe_plans = plans
    key = (dest_is_row,)
    if key in plans:
        return plans[key]
    vals = spstore.vals
    if isinstance(vals, dict) or np.dtype(vals.dtype).itemsize > 4:
        plans[key] = None
        return None
    hc = getattr(spstore, "_host_cache", None)
    if hc is not None:
        # build-time host copies: avoids device->host reads, which
        # permanently degrade the tunneled-TPU runtime (see sparse.py)
        rowids, cols, ok, vals_h = hc
    else:
        rowids = np.asarray(spstore.rowids)
        cols = np.asarray(spstore.cols)
        ok = np.asarray(spstore.ok)
        vals_h = np.asarray(vals)
    d = (rowids if dest_is_row else cols)[ok]
    k = (cols if dest_is_row else rowids)[ok]
    n_out = spstore.nrows if dest_is_row else spstore.ncols
    n_in = spstore.ncols if dest_is_row else spstore.nrows
    cdt = sp.carrier_dtype(vals_h.dtype)
    plan = build_plan(d, k, vals_h[ok].astype(cdt), n_out, n_in)
    if plan is None:
        plans[key] = None
        return None
    # decompose the three static permutations into Clos-route stage plans
    # (permute.py): replaces the round-4 global lax.sorts
    perms = {"routeP": pm.build_perm_plan(plan["route"]),
             "extP": pm.build_perm_plan(plan["ext_rank"])}
    dev = {}
    for name in ("meta", "idx1_g", "locidx_g", "okg", "avals_g", "barrier",
                 "oks", "out_ok", "l2_ids", "l2_mask"):
        if name in plan:
            arr = plan[name]
            if arr.dtype == bool:
                arr = arr.astype(np.int32)
            dev[name] = jnp.asarray(arr)
    entry = {k2: v for k2, v in plan.items() if not isinstance(v, np.ndarray)}
    pmeta = {}
    for pname, pplan in perms.items():
        meta_p, dev_p = pm.plan_to_device(pplan)
        pmeta[pname] = meta_p
        dev[pname] = dev_p
    entry["permmeta"] = pmeta
    entry["dev"] = dev
    entry["key"] = (entry["L"], entry["R_g"], entry["V"], entry["n_in"],
                    entry["n_out"], entry["two_level"],
                    entry.get("n_split", 0), entry.get("W2", 0),
                    tuple(sorted((k3, v3["T"], v3["T_pad"])
                                 for k3, v3 in pmeta.items())))
    plans[key] = entry
    return entry


def plan_dyn_tuple(entry):
    d = entry["dev"]
    base = (d["meta"], d["idx1_g"], d["locidx_g"], d["okg"], d["avals_g"],
            d["barrier"], d["oks"], d["routeP"], d["extP"], d["out_ok"])
    if entry["two_level"]:
        return base + (d["l2_ids"], d["l2_mask"])
    return base


# --------------------------------------------------------------------- #
# the traced pipeline
def spmv_pipeline(plan_dyn, meta, u_vals, u_valid, ring, a_dt, u_dt, *,
                  kind):
    """(out_vals[n_out] in monoid dtype, out_valid[n_out]).

    Channel strategy (round-5): validity is only routed through the Clos
    permutations when it is genuinely dynamic.  BOOL monoids pack
    (validity, value) into one i32 code 0 / 1+value.  Other dtypes branch
    on ``all(u_valid)`` with lax.cond: the full-validity branch (the
    PageRank shape — dense rank vector every iteration) routes a single
    value channel and takes the statically-known output structure
    (deg>0); only the sparse-u branch pays the second channel.
    """
    (gmeta, idx1, locidx, okg, avals, barrier, oks, routeP, extP,
     out_ok) = plan_dyn[:10]
    R_g = meta["R_g"]
    L = meta["L"]
    n_out = meta["n_out"]
    n_in = meta["n_in"]
    nblocks = meta["nblocks_g"]
    two_level = meta["two_level"]
    if two_level:
        l2_ids, l2_mask = plan_dyn[10:12]
        n_split = meta["n_split"]
        W2 = meta["W2"]
        L2req = meta["L2req"]
    mult = ring.binaryop
    mono = ring.monoid
    z_dt = mono.type
    z_c = sp.carrier_dtype(z_dt.np_type)
    ident_c = np.array(mono.identity, z_dt.np_type).astype(np.dtype(z_c))
    packed = np.dtype(z_dt.np_type).kind == "b"

    # dense u -> padded (Ru,128) carrier tables
    u_c = sp.carrier_dtype(u_dt.np_type)
    Ru = _ceil_to(max(n_in, 1), WINDOW_K) // 128
    pad = Ru * 128 - n_in
    u2 = jnp.concatenate([u_vals.astype(u_c),
                          jnp.zeros(pad, u_c)]).reshape(Ru, 128)
    u2ok = jnp.concatenate([u_valid.astype(jnp.int32),
                            jnp.zeros(pad, jnp.int32)]).reshape(Ru, 128)

    comb = sp.monoid_scan_fn(mono.parent.name, z_c)

    def combine(a, b):
        r = comb(a, b)
        return r.astype(z_c) if r.dtype != a.dtype else r

    def combine_packed(a, b):
        # codes: 0 = no value, 1+v = value v; 0 is the packed identity
        r = comb(a - 1, b - 1) + 1
        return jnp.where(a == 0, b, jnp.where(b == 0, a, r))

    def gather(want_packed, full_u):
        if _use_pallas():
            with jax.enable_x64(False):
                # fold the route's stage A into the gather output write
                # (blocks index only the first R_g rows of packed_A)
                return gather_mult(
                    (gmeta, idx1, locidx, okg, avals), u2, u2ok, mult,
                    a_dt, u_dt, mono, kind=kind, R_g=R_g, nblocks=nblocks,
                    packed=want_packed, full_u=full_u, permA=routeP[0])
        # XLA fallback (CPU correctness): flat gather of u at k per slot:
        # k = wb*16384 + arow*128 + idx1[blk, arow, lane]
        arow = locidx.reshape(-1).astype(jnp.int64)
        wb_rows = jnp.repeat(gmeta[:, 0].astype(jnp.int64), BR_G * 128)
        blk = jnp.repeat(jnp.arange(nblocks, dtype=jnp.int64), BR_G * 128)
        lanes = jnp.tile(jnp.arange(128), R_g)
        b_col = jnp.take(idx1.reshape(-1).astype(jnp.int64),
                         (blk * 128 + arow) * 128 + lanes)
        kk = wb_rows * 16384 + arow * 128 + b_col
        kk = jnp.minimum(kk, Ru * 128 - 1)
        g = jnp.take(u2.reshape(-1), kk).reshape(R_g, 128)
        if full_u:
            ok = okg != 0
        else:
            go = jnp.take(u2ok.reshape(-1), kk).reshape(R_g, 128)
            ok = (okg != 0) & (go != 0)
        x_in = g.astype(u_dt.np_type)
        a_in = avals.astype(a_dt.np_type)
        if kind == "mxv":
            p = dense.apply_binop(mult, a_in, a_dt, x_in, u_dt,
                                  context_map=dense._MATMUL_MAP)
        else:
            p = dense.apply_binop(mult, x_in, u_dt, a_in, a_dt,
                                  context_map=dense._MATMUL_MAP)
        p = st.cast_values(p, mult.return_type, z_dt).astype(z_c)
        if want_packed:
            return jnp.where(ok, p.astype(jnp.int32) + 1, 0), None
        if full_u:
            return jnp.where(ok, p, ident_c), None
        return jnp.where(ok, p, ident_c), ok.astype(jnp.int32)

    def perm(P, name, arrs, out_limit=None, skip_a=False):
        with jax.enable_x64(False):
            return pm.apply_perm(meta["permmeta"][name], P, arrs,
                                 use_pallas=_use_pallas(),
                                 interpret=_INTERPRET, out_limit=out_limit,
                                 skip_a=skip_a)

    def scan(bar, v, h, cmb):
        if _use_pallas():
            with jax.enable_x64(False):
                return lane_segscan(bar, v, h, cmb)
        return _segscan_xla(bar, v, h, cmb)

    def pad_to_L(x, fill, dtype):
        x = x.reshape(-1)
        if L > R_g * 128:
            x = jnp.concatenate([x, jnp.full(L - R_g * 128, fill, dtype)])
        return x.reshape(-1, 128)

    def tail_two_level(e_v, cmb, fill):
        """Recombine split-destination partials: identity-mask the
        appendix groups, tree-reduce each with the monoid, scatter the
        handful of results into the natural-order totals (all XLA — the
        round-4 level-2 scan+permute cost 4 kernel launches)."""
        app = e_v[n_out:n_out + n_split * W2].reshape(n_split, W2)
        app = jnp.where(l2_mask != 0, app, fill)
        w = W2
        while w > 1:
            half = w // 2
            app = cmb(app[:, :half], app[:, half:w])
            w = half
        return e_v[:n_out].at[l2_ids].set(app[:, 0])

    def run_single(pv_flat, cmb, fill):
        """Route + scan + extract one channel; returns flat e_v.

        On the Pallas path the route's final stage, the scan, and the
        extract's first stage run as ONE fused kernel."""
        lim1 = L2req if two_level else n_out
        if _use_pallas():
            with jax.enable_x64(False):
                preC, = pm.apply_perm_pre_c(
                    meta["permmeta"]["routeP"], routeP, [pv_flat],
                    interpret=_INTERPRET, skip_a=True)
                yAe = fused_permC_scan_permA(routeP[2], barrier, extP[0],
                                             preC, cmb)
                e_v, = pm.apply_perm_post_a(
                    meta["permmeta"]["extP"], extP, [yAe],
                    interpret=_INTERPRET, out_limit=lim1)
            e_v = e_v.reshape(-1)
        else:
            pv2, = perm(routeP, "routeP", [pv_flat])
            s_v, _ = scan(barrier, pv2, None, cmb)
            e_v, = perm(extP, "extP", [s_v], out_limit=lim1)
            e_v = e_v.reshape(-1)
        if two_level:
            e_v = tail_two_level(e_v, cmb, fill)
        return e_v

    if packed:
        codes, _ = gather(True, False)
        cf = pad_to_L(codes, 0, jnp.int32)
        e_v = run_single(cf, combine_packed, 0)
        out = jnp.maximum(e_v[:n_out] - 1, 0).astype(z_dt.np_type)
        return out, e_v[:n_out] > 0

    def fast(_):
        prods, _ = gather(False, True)
        pf = pad_to_L(prods, ident_c, z_c)
        e_v = run_single(pf, combine, ident_c)
        return e_v[:n_out].astype(z_dt.np_type), out_ok[:n_out] != 0

    def slow(_):
        prods, okp = gather(False, False)
        pf = pad_to_L(prods, ident_c, z_c)
        hf = pad_to_L(okp, 0, jnp.int32)
        pv2, ph_r = perm(routeP, "routeP", [pf, hf],
                         skip_a=_use_pallas())
        ph2 = (ph_r != 0) & (oks != 0)
        pv2 = jnp.where(ph2, pv2, ident_c)
        ph2 = ph2.astype(jnp.int32)
        s_v, s_h = scan(barrier, pv2, ph2, combine)
        lim1 = L2req if two_level else n_out
        e_v, e_h = perm(extP, "extP", [s_v, s_h], out_limit=lim1)
        e_v = e_v.reshape(-1)
        e_h = e_h.reshape(-1)
        if two_level:
            # partials with no valid contribution act as the identity;
            # group validity = any partial valid
            e_v = jnp.where(e_h != 0, e_v, ident_c)
            e_v = tail_two_level(e_v, combine, ident_c)
            e_h = tail_two_level(e_h, jnp.maximum, 0)
        return e_v[:n_out].astype(z_dt.np_type), e_h[:n_out] > 0

    return jax.lax.cond(jnp.all(u_valid), fast, slow, None)
