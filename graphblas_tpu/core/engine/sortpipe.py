"""Sort-pipeline SpMV/reduce engine: the TPU hot path for sparse matvec.

Motivation (measured on TPU v5e): XLA's flat gather runs at ~0.13 Gidx/s
while ``lax.sort`` of an (i32 key, 32-bit payload) pair runs at ~30-110
Gelem/s (an in-VMEM radix path) and a Pallas segmented-scan kernel streams
at memory bandwidth.  So the semiring matvec

    w[i] = monoid_j mult(A[i, j], u[j])

is expressed here with **zero edge-length gathers or scatters**:

1. *merge*: one sort routes the dense-vector entries ``u`` in between the
   edges ordered contraction-major (plan permutation, fixed per structure);
2. *fill*: a Pallas segmented scan broadcasts each u-entry forward onto its
   edges (on CPU the same scan runs via ``lax.associative_scan``);
3. *multiply*: the typed binary op is applied edgewise via the dense
   engine's generic ``apply_binop`` (any semiring multiply, any dtype);
4. *route*: one sort moves products into a destination-major layout in
   which every output row is led by one identity slot;
5. *reduce*: a Pallas segmented scan folds each row with the monoid;
6. *extract*: one sort compacts the per-row totals into the dense output.

The per-structure "plan" (the sort rank arrays, segment barriers and
extraction ranks) is built once on device by a jitted builder and cached on
the :class:`~graphblas_tpu.core.engine.sparse.SparseStore`; per-call work is
3-6 sorts + 2 scans, all O(L) streaming passes.

This replaces the reference's delegation of SpMV to SuiteSparse's
saxpy/dot kernels (reference graphblas/core/ss/descriptor.py:74-80
``axb_method``) with a TPU-native formulation; it is not a translation —
the reference has no analogous code.

Eligibility: 32-bit-representable value dtypes (BOOL..INT32/UINT32/FP32 —
wider dtypes keep the generic gather/associative-scan path in sparse.py),
identity-carrying builtin monoids, non-positional multiplies (positional
ops carry (i,j,k) plan arrays; see ``plan_positions``).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import store as st

_IDX = jnp.int32

# monoids the segmented scan supports: name -> lambda building the combine
_SCAN_MONOIDS = {
    "plus": lambda a, b: a + b,
    "times": lambda a, b: a * b,
    "min": jnp.minimum,
    "max": jnp.maximum,
    "lor": jnp.logical_or,
    "land": jnp.logical_and,
    "lxor": jnp.logical_xor,
    "band": lambda a, b: a & b,
    "bor": lambda a, b: a | b,
    "bxor": lambda a, b: a ^ b,
    "lxnor": lambda a, b: a == b,
    "eq": lambda a, b: a == b,
}


def monoid_scan_fn(name, np_dtype):
    """Return the scan combine for monoid `name` over the carried dtype
    (values are carried as i32/f32 in the kernel), or None."""
    fn = _SCAN_MONOIDS.get(name)
    if fn is None:
        return None
    d = np.dtype(np_dtype)
    if d.kind == "b" or (d == np.int32 and name in ("lor", "land", "lxor",
                                                    "lxnor", "eq")):
        # booleans carried as i32 0/1
        if name == "lor":
            return lambda a, b: jnp.maximum(a, b)
        if name == "land":
            return lambda a, b: a * b
        if name in ("lxor",):
            return lambda a, b: a ^ b
        if name in ("lxnor", "eq"):
            return lambda a, b: 1 - (a ^ b)
    return fn


def eligible_dtype(dt):
    """32-bit-representable, non-UDT dtype."""
    if dt._is_udt:
        return False
    d = np.dtype(dt.np_type)
    return d.kind in "biuf" and d.itemsize <= 4


def carrier_dtype(np_dtype):
    """dtype values are carried as through sorts/scans."""
    d = np.dtype(np_dtype)
    if d.kind == "f":
        return jnp.float32
    if d.kind == "u" and d.itemsize == 4:
        return jnp.uint32
    return jnp.int32


# --------------------------------------------------------------------- #
# primitives
def sort_apply(ranks, vals):
    """Move vals[i] to position ranks[i] (ranks: distinct i32 in [0, L))."""
    return jax.lax.sort((ranks, vals), num_keys=1)[1]


def sort_apply2(ranks, a, b):
    """Route two payloads by the same rank array.

    Measured on TPU v5e: one 3-operand ``lax.sort`` is SLOWER than two
    (key, payload) sorts — XLA's fast radix path specializes the 2-operand
    form — so this issues two sorts on TPU and keeps the fused form on
    CPU where it wins."""
    if jax.default_backend() == "tpu":
        return (jax.lax.sort((ranks, a), num_keys=1)[1],
                jax.lax.sort((ranks, b), num_keys=1)[1])
    return jax.lax.sort((ranks, a, b), num_keys=1)[1:]


# test hook: force the Pallas kernel in interpret mode on CPU so its logic
# (esp. the inter-block carry) is exercised without TPU hardware
_INTERPRET = False


def _use_pallas():
    return _INTERPRET or jax.default_backend() == "tpu"


def segscan(barrier, vals, combines):
    """Inclusive segmented scan; segments restart where barrier != 0.

    barrier: i32[L] with barrier[0] == 1.  vals: list of 1-D arrays (L,),
    32-bit dtypes.  combines: per-array associative fns.  Sequential-fold
    semantics (deterministic order).
    """
    if _use_pallas():
        # trace the kernel with x64 off: all operands are already 32-bit,
        # and stray 64-bit literals fail Mosaic legalization
        with jax.enable_x64(False):
            return _segscan_pallas(barrier, vals, tuple(combines))
    return _segscan_xla(barrier, vals, combines)


def _segscan_xla(barrier, vals, combines):
    b = barrier != 0

    def comb(left, right):
        bl, vl = left[0], left[1:]
        br, vr = right[0], right[1:]
        out = tuple(jnp.where(br, r, c(l, r))
                    for l, r, c in zip(vl, vr, combines))
        return (bl | br,) + out

    res = jax.lax.associative_scan(comb, (b, *vals))
    return list(res[1:])


@functools.partial(jax.named_call, name="segscan_pallas")
def _noop(x):
    return x


def _segscan_pallas(barrier, vals, combines):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def _s32(s):
        # keep roll shifts 32-bit: x64 mode would promote python ints to
        # i64, which Mosaic's dynamic_rotate rejects
        return jnp.int32(s)

    L = barrier.shape[0]
    BC = 128
    R = L // BC
    BR = min(256, R)
    nv = len(vals)

    def kernel(*refs):
        b_ref = refs[0]
        v_refs = refs[1:1 + nv]
        o_refs = refs[1 + nv:1 + 2 * nv]
        vcars = refs[1 + 2 * nv:1 + 3 * nv]
        i = pl.program_id(0)

        b = b_ref[:] != 0
        vs = [r[:] for r in v_refs]
        lane = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (BR, BC), 0)
        for s in [1 << k for k in range(7)]:
            bsh = pltpu.roll(b.astype(jnp.int32), _s32(s), 1) != 0
            okm = lane >= s
            vs = [jnp.where(b | ~okm, v, c(pltpu.roll(v, _s32(s), 1), v))
                  for v, c in zip(vs, combines)]
            b = b | (okm & bsh)
        for s in [1 << k for k in range(BR.bit_length() - 1)]:
            bsh = pltpu.roll(b.astype(jnp.int32), _s32(s), 0) != 0
            okm = row >= s
            last_b = jnp.broadcast_to(bsh[:, BC - 1:BC], (BR, BC))
            vs = [jnp.where(b | ~okm, v,
                            c(jnp.broadcast_to(
                                pltpu.roll(v, _s32(s), 0)[:, BC - 1:BC], (BR, BC)),
                              v))
                  for v, c in zip(vs, combines)]
            b = b | (okm & last_b)
        # inter-block carry: positions with no in-block barrier continue the
        # running segment from the previous block's last element.  Block 0
        # never combines (barrier[0] == 1 makes b all-True there, and its
        # vcar SMEM is uninitialized -- the `i == 0` guard keeps it unread).
        merged = [jnp.where(b | (i == 0), v, c(vcar[0, 0], v))
                  for v, c, vcar in zip(vs, combines, vcars)]
        for o, v in zip(o_refs, merged):
            o[:] = v
        for vcar, v in zip(vcars, merged):
            vcar[0, 0] = v[BR - 1, BC - 1]

    spec = pl.BlockSpec((BR, BC), lambda i: (i, 0), memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(R // BR,),
        in_specs=[spec] * (1 + nv),
        out_specs=tuple([spec] * nv),
        out_shape=tuple(jax.ShapeDtypeStruct((R, BC), v.dtype) for v in vals),
        scratch_shapes=[pltpu.SMEM((1, 1), v.dtype) for v in vals],
        compiler_params=pltpu.CompilerParams(
            # the scan carry in SMEM makes grid steps order-dependent
            dimension_semantics=("arbitrary",),
        ),
        interpret=_INTERPRET,
    )(barrier.reshape(R, BC), *[v.reshape(R, BC) for v in vals])
    return [o.reshape(L) for o in outs]


# --------------------------------------------------------------------- #
# plan construction (one-time per structure+direction, jitted)
def _plan_len(n_in, n_out, cap):
    L = 1 << 12  # >= 128*(BR>=8); keeps pallas block shapes legal
    need = max(n_in, n_out) + cap + 2
    while L < need:
        L <<= 1
    return L


def _free_slots(used_ranks, L, count):
    """Ascending list of the `count` positions in [0, L) not in used_ranks."""
    mark = jnp.zeros(L, _IDX).at[used_ranks].set(1, mode="drop")
    key = mark * L + jax.lax.iota(_IDX, L)
    return jax.lax.sort((key, jax.lax.iota(_IDX, L)), num_keys=1)[1][:count]


def _stable_order_by(key_ids, cap):
    """d-positions sorted stably by key_ids (i64 composite key)."""
    pos = jax.lax.iota(_IDX, cap)
    composite = key_ids.astype(jnp.int64) * cap + pos.astype(jnp.int64)
    sk, order = jax.lax.sort((composite, pos), num_keys=1)
    return (sk // cap).astype(_IDX), order


def build_plan_device(rowids, cols, ok, *, cap, n_out, n_in, dest_is_row):
    """Jit-traceable plan builder.  One-time sorts/scatters are fine here."""
    L = _plan_len(n_in, n_out, cap)
    dest_ids = rowids if dest_is_row else cols
    k_ids = cols if dest_is_row else rowids
    okc = ok
    k_eff = jnp.where(okc, jnp.minimum(k_ids, n_in), n_in).astype(_IDX)
    dest_eff = jnp.where(okc, jnp.minimum(dest_ids, n_out), n_out).astype(_IDX)

    # ---- merge side (contraction-major)
    k_q, d_of_q = _stable_order_by(k_eff, cap)
    indptr_k = jnp.searchsorted(k_q, jnp.arange(n_in + 1, dtype=_IDX)
                                ).astype(_IDX)
    rank_x = indptr_k[:n_in] + jax.lax.iota(_IDX, n_in)
    rank_e_q = jax.lax.iota(_IDX, cap) + k_q + 1
    merged_slot_of_d = jnp.zeros(cap, _IDX).at[d_of_q].set(rank_e_q)
    free_m = _free_slots(rank_x, L, L - n_in)
    rank_m = jnp.concatenate([rank_x, free_m])
    barrier_m = jnp.zeros(L, _IDX).at[rank_x].set(1)

    # ---- interleaved destination side
    dest_dd, dd_of = _stable_order_by(dest_eff, cap)
    indptr_d = jnp.searchsorted(dest_dd, jnp.arange(n_out + 1, dtype=_IDX)
                                ).astype(_IDX)
    ident_pos = indptr_d[:n_out] + jax.lax.iota(_IDX, n_out)
    inter_slot_of_dd = jax.lax.iota(_IDX, cap) + dest_dd + 1
    inter_slot_of_d = jnp.zeros(cap, _IDX).at[dd_of].set(inter_slot_of_dd)
    barrier_i = jnp.zeros(L, _IDX).at[ident_pos].set(1)

    # rank_back: merged slot -> interleaved slot (free slots paired in order)
    used_m = merged_slot_of_d
    free_src = _free_slots(used_m, L, L - cap)
    free_dst = _free_slots(inter_slot_of_d, L, L - cap)
    rank_back = (jnp.zeros(L, _IDX)
                 .at[used_m].set(inter_slot_of_d)
                 .at[free_src].set(free_dst))

    # extraction: last slot of each out row -> rank r, everything else after
    last_pos = indptr_d[1:n_out + 1] + jax.lax.iota(_IDX, n_out)
    ext_rank = (n_out + jax.lax.iota(_IDX, L)).at[last_pos].set(
        jax.lax.iota(_IDX, n_out))

    return {
        "rank_m": rank_m,
        "barrier_m": barrier_m,
        "merged_slot_of_d": merged_slot_of_d,
        "rank_back": rank_back,
        "barrier_i": barrier_i,
        "ext_rank": ext_rank,
    }


def plan_positions(rowids, cols, ok, merged_slot_of_d, L, nrows, ncols):
    """(i, j) coordinate arrays in the merged layout, for positional ops."""
    i_m = jnp.zeros(L, _IDX).at[merged_slot_of_d].set(
        jnp.minimum(rowids, nrows).astype(_IDX))
    j_m = jnp.zeros(L, _IDX).at[merged_slot_of_d].set(
        jnp.minimum(cols, ncols).astype(_IDX))
    return i_m, j_m


# --------------------------------------------------------------------- #
# plan cache on SparseStore
_PLAN_BUILDERS = {}


def get_plan(sp, dest_is_row, *, at=False):
    """Cached plan for a SparseStore.  `at` applies the lazy transpose by
    swapping coordinate roles (so dest 'row' on A.T = dest 'col' on A)."""
    # ensure_compile_time_eval: may first run inside an ss.iterate
    # while-body trace; cached device arrays must not be tracers
    with jax.ensure_compile_time_eval(), jax.enable_x64(True):
        return _get_plan(sp, dest_is_row, at=at)


def _get_plan(sp, dest_is_row, *, at=False):
    if at:
        dest_is_row = not dest_is_row
    plans = getattr(sp, "_sortpipe_plans", None)
    if plans is None:
        plans = {}
        sp._sortpipe_plans = plans
    nrows, ncols = sp.nrows, sp.ncols
    n_out = nrows if dest_is_row else ncols
    n_in = ncols if dest_is_row else nrows
    key = (dest_is_row,)
    got = plans.get(key)
    if got is not None:
        return got
    bkey = (sp.cap, n_out, n_in, dest_is_row)
    builder = _PLAN_BUILDERS.get(bkey)
    if builder is None:
        builder = jax.jit(functools.partial(
            build_plan_device, cap=sp.cap, n_out=n_out, n_in=n_in,
            dest_is_row=True))
        _PLAN_BUILDERS[bkey] = builder
    # roles swapped here instead of inside the builder: builder always sees
    # (dest_ids, k_ids) as (rowids, cols)
    if dest_is_row:
        plan = builder(sp.rowids, sp.cols, sp.ok)
    else:
        plan = builder(sp.cols, sp.rowids, sp.ok)
    L = int(plan["rank_m"].shape[0])
    # per-store value/ok arrays in merged layout (cast to carrier dtype)
    def scatter_m(arr):
        flat = arr
        out = jnp.zeros((L,) + flat.shape[1:], flat.dtype)
        return out.at[plan["merged_slot_of_d"]].set(flat)

    vals = sp.vals
    if not isinstance(vals, dict) and np.dtype(vals.dtype).itemsize <= 4:
        cdt = carrier_dtype(vals.dtype)
        vals_m = scatter_m(vals.astype(cdt))
    else:
        vals_m = None  # ineligible dtypes keep the generic path
    ok_m = scatter_m(sp.ok.astype(jnp.int32))
    entry = {"plan": plan, "vals_m": vals_m, "ok_m": ok_m, "L": L,
             "n_in": n_in, "n_out": n_out}
    plans[key] = entry
    return entry


# --------------------------------------------------------------------- #
# per-call pipelines (traced inside the dispatcher's jit)
def spmv_pipeline(plan_dyn, u_vals, u_valid, ring, a_dt, u_dt, *, kind,
                  n_in, n_out, L, a_np, out_np):
    """Returns (out_vals[n_out] in monoid dtype, out_valid[n_out]).

    plan_dyn = (rank_m, barrier_m, rank_back, barrier_i, ext_rank,
                vals_m, ok_m) -- all device arrays passed as jit inputs.
    """
    from . import dense

    rank_m, barrier_m, rank_back, barrier_i, ext_rank, vals_m, ok_m = plan_dyn
    mult = ring.binaryop
    mono = ring.monoid
    u_c = carrier_dtype(u_dt.np_type)
    pay_v = jnp.concatenate([u_vals.astype(u_c),
                             jnp.zeros(L - n_in, u_c)])
    pay_h = jnp.concatenate([u_valid.astype(jnp.int32),
                             jnp.zeros(L - n_in, jnp.int32)])
    m_v, m_h = sort_apply2(rank_m, pay_v, pay_h)
    first = lambda a, b: a  # noqa: E731
    f_v, f_h = segscan(barrier_m, [m_v, m_h], [first, first])

    # multiply at merged slots with the typed op (generic, casts inside)
    x_in = f_v.astype(u_dt.np_type) if f_v.dtype != u_dt.np_type else f_v
    a_in = vals_m.astype(a_dt.np_type) if vals_m.dtype != np.dtype(a_dt.np_type) else vals_m
    if kind == "mxv":
        prods = dense.apply_binop(mult, a_in, a_dt, x_in, u_dt,
                                  context_map=dense._MATMUL_MAP)
    else:
        prods = dense.apply_binop(mult, x_in, u_dt, a_in, a_dt,
                                  context_map=dense._MATMUL_MAP)
    prods = st.cast_values(prods, mult.return_type, mono.type)
    ok = (f_h != 0) & (ok_m != 0) & (barrier_m == 0)

    ident = st.identity_value_array(mono, mono.type)
    z_c = carrier_dtype(mono.type.np_type)
    prods_c = prods.astype(z_c)
    ident_c = jnp.asarray(ident).astype(z_c)
    prods_c = jnp.where(ok, prods_c, ident_c)
    okc = ok.astype(jnp.int32)

    i_v, i_h = sort_apply2(rank_back, prods_c, okc)
    i_v = jnp.where((i_h != 0) & (barrier_i == 0), i_v, ident_c)

    comb = monoid_scan_fn(mono.parent.name, z_c)
    plus = lambda a, b: a + b  # noqa: E731

    def combv(a, b):
        r = comb(a, b)
        return r.astype(z_c) if r.dtype != a.dtype else r

    s_v, s_h = segscan(barrier_i, [i_v, i_h], [combv, plus])
    e_v, e_h = sort_apply2(ext_rank, s_v, s_h)
    out = e_v[:n_out].astype(mono.type.np_type)
    return out, e_h[:n_out] > 0


def reduce_pipeline(plan_dyn, mono, in_dt, *, n_out, L):
    """Row/column monoid reduction of the store itself (dest side only)."""
    rank_m, barrier_m, rank_back, barrier_i, ext_rank, vals_m, ok_m = plan_dyn
    # store values sit at merged slots; route them straight to interleaved
    z_c = carrier_dtype(mono.type.np_type)
    vals_c = vals_m.astype(np.dtype(in_dt.np_type)).astype(
        mono.type.np_type).astype(z_c)
    ident = st.identity_value_array(mono, mono.type)
    ident_c = jnp.asarray(ident).astype(z_c)
    ok = ok_m != 0
    vals_c = jnp.where(ok, vals_c, ident_c)
    i_v, i_h = sort_apply2(rank_back, vals_c, ok.astype(jnp.int32))
    i_v = jnp.where((i_h != 0) & (barrier_i == 0), i_v, ident_c)
    comb = monoid_scan_fn(mono.parent.name, z_c)
    plus = lambda a, b: a + b  # noqa: E731

    def combv(a, b):
        r = comb(a, b)
        return r.astype(z_c) if r.dtype != a.dtype else r

    s_v, s_h = segscan(barrier_i, [i_v, i_h], [combv, plus])
    e_v, e_h = sort_apply2(ext_rank, s_v, s_h)
    return e_v[:n_out].astype(mono.type.np_type), e_h[:n_out] > 0


def eligible_spmv(ring, a_dt, u_dt):
    """Can the pipeline execute this (ring, dtypes) combination?"""
    mono = ring.monoid
    mult = ring.binaryop
    if mult._positional is not None:
        return False
    if not (eligible_dtype(a_dt) and eligible_dtype(u_dt)):
        return False
    if mono.type._is_udt or not eligible_dtype(mono.type):
        return False
    if getattr(mult, "return_type", None) is None:
        return False
    if not eligible_dtype(mult.return_type):
        return False
    if monoid_scan_fn(mono.parent.name, carrier_dtype(mono.type.np_type)) is None:
        return False
    if mono.identity is None:  # host check: no device work on dispatch
        return False
    return True


def eligible_reduce(mono, in_dt):
    if mono.type._is_udt or not eligible_dtype(mono.type):
        return False
    if not eligible_dtype(in_dt):
        return False
    if monoid_scan_fn(mono.parent.name, carrier_dtype(mono.type.np_type)) is None:
        return False
    if mono.identity is None:  # host check: no device work on dispatch
        return False
    return True


def plan_dyn_tuple(entry):
    p = entry["plan"]
    return (p["rank_m"], p["barrier_m"], p["rank_back"], p["barrier_i"],
            p["ext_rank"], entry["vals_m"], entry["ok_m"])
