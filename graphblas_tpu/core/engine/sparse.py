"""Sparse (padded-CSR) device storage and compute kernels.

This is the scale path of the engine: where the bitmap store in store.py /
dense.py holds O(nrows*ncols) device memory, a :class:`SparseStore` holds the
stored entries only, as static-capacity edge arrays — the TPU-native analog
of the reference's CSR/hypersparse formats inside SuiteSparse
(SURVEY Appendix C; reference core/ss/matrix.py:1165 import_csr).

Layout (all jax arrays, static ``cap``-length, XLA-friendly):

- ``rowids`` int32[cap], ``cols`` int32[cap]: coordinates sorted
  lexicographically by (row, col).  Padding slots carry the sentinels
  ``rowids == nrows`` / ``cols == ncols`` so they sort last in both
  orderings and fall outside every segment.
- ``vals``: values pytree[cap] (dict of field arrays for struct UDTs,
  trailing dims for subarray UDTs — same convention as store.py).
- ``ok`` bool[cap]: entry validity.  select/ewise_mult shrink structure by
  clearing ``ok`` without repacking, keeping shapes static under jit.
- ``csc_perm`` int32[cap]: the permutation to (col, row) order, computed
  once per structure.  vxm/reduce_columnwise route products through this
  fixed gather instead of scattering — scatters are the slow path on TPU,
  sorted-segment reductions ride the VPU.

Semiring matvec = gather x at the contraction index + multiply edge-wise +
sorted-segment monoid reduction (generic over any monoid, including UDTs and
identity-less monoids, via a validity-carrying segmented associative scan).
This mirrors the design the reference delegates to SuiteSparse's saxpy/dot
SpMV kernels (reference core/ss/descriptor.py:74-80 ``axb_method``), chosen
TPU-first instead of translated.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np

from ..dtypes import lookup_dtype
from . import dense, store as st

_IDX = jnp.int32
_structure_counter = itertools.count()


def _round_capacity(n):
    """Round nnz up to a jit-cache-friendly bucket (next power of two,
    min 1024) so growing graphs reuse compiled kernels."""
    cap = 1024
    while cap < n:
        cap <<= 1
    return cap


class SparseStore:
    """Host-side handle for a padded-CSR device store."""

    __slots__ = ("rowids", "cols", "vals", "ok", "csc_perm", "nrows", "ncols",
                 "cap", "is_diag", "token", "_sortpipe_plans", "_lanepipe_plans",
                 "_nvals_cache", "_host_cache")

    def __init__(self, rowids, cols, vals, ok, csc_perm, nrows, ncols, *,
                 is_diag=False, token=None):
        self.rowids = rowids
        self.cols = cols
        self.vals = vals
        self.ok = ok
        self.csc_perm = csc_perm
        self.nrows = int(nrows)
        self.ncols = int(ncols)
        self.cap = int(rowids.shape[0])
        self.is_diag = bool(is_diag)
        self.token = next(_structure_counter) if token is None else token
        self._sortpipe_plans = None
        self._lanepipe_plans = None
        self._host_cache = None
        self._nvals_cache = None

    # dyn tuple crossing into jit: arrays only, fixed arity 5
    def _dyn(self):
        return (self.rowids, self.cols, self.vals, self.ok, self.csc_perm)

    def _statics(self):
        return ("sp", self.cap, self.nrows, self.ncols, self.is_diag)

    def with_store(self, dyn, *, same_structure=True, nrows=None, ncols=None):
        rowids, cols, vals, ok, csc_perm = dyn
        return SparseStore(
            rowids, cols, vals, ok, csc_perm,
            self.nrows if nrows is None else nrows,
            self.ncols if ncols is None else ncols,
            is_diag=self.is_diag and same_structure,
            token=self.token if same_structure else None,
        )

    def nvals(self):
        if self._nvals_cache is None:
            self._nvals_cache = int(np.asarray(jnp.sum(self.ok)))
        return self._nvals_cache

    def host_coo(self):
        """(rows, cols, values) int64/np arrays of the stored entries."""
        ok = np.asarray(self.ok)
        r = np.asarray(self.rowids)[ok].astype(np.int64)
        c = np.asarray(self.cols)[ok].astype(np.int64)
        if isinstance(self.vals, dict):
            v = {k: np.asarray(a)[ok] for k, a in self.vals.items()}
        else:
            v = np.asarray(self.vals)[ok]
        return r, c, v


def is_sparse_dyn(item):
    return isinstance(item, tuple) and len(item) == 5


# --------------------------------------------------------------------- #
# construction
def build_sparse_store(rows, cols, values, nrows, ncols, dtype, *, cap=None,
                       is_diag=False):
    """Build from host COO already sorted by (row, col) and deduplicated.

    `values` is an np array (or dict of field arrays for struct UDTs).
    """
    n = len(rows)
    cap = _round_capacity(n) if cap is None else cap
    r = np.full(cap, nrows, np.int32)
    c = np.full(cap, ncols, np.int32)
    ok = np.zeros(cap, bool)
    r[:n] = rows
    c[:n] = cols
    ok[:n] = True
    # permutation to (col, row) order; sentinels sort last
    csc_perm = np.lexsort((r, c)).astype(np.int32)
    if dtype.np_type.names:
        vals = {}
        for name in dtype.np_type.names:
            ft = dtype.np_type.fields[name][0]
            base = ft.subdtype[0] if ft.subdtype else ft
            sub = ft.subdtype[1] if ft.subdtype else ()
            buf = np.zeros((cap,) + sub, base)
            if n:
                buf[:n] = values[name] if isinstance(values, dict) else values[name]
            vals[name] = jnp.asarray(buf)
    elif dtype.np_type.subdtype is not None:
        base, sub = dtype.np_type.subdtype
        buf = np.zeros((cap,) + sub, base)
        if n:
            buf[:n] = values
        vals = jnp.asarray(buf)
    else:
        buf = np.zeros(cap, dtype.np_type)
        if n:
            buf[:n] = values
        vals = jnp.asarray(buf)
    out = SparseStore(jnp.asarray(r), jnp.asarray(c), vals, jnp.asarray(ok),
                      jnp.asarray(csc_perm), nrows, ncols, is_diag=is_diag)
    out._nvals_cache = int(n)  # known at build: no later device sync needed
    # host copies let plan builders (engine/lanepipe.py) avoid device->host
    # reads: the first D2H permanently degrades the tunneled-TPU runtime to
    # ~9 ms/launch (measured tools/ubench_lanepipe.py findings, round 4)
    if not dtype.np_type.names and dtype.np_type.subdtype is None:
        out._host_cache = (r, c, ok, buf)
    return out


def diag_sparse_store(v_vals, v_valid, n):
    """Sparse diagonal matrix store from a dense vector store (device-side)."""
    ar = jnp.arange(n, dtype=_IDX)
    return SparseStore(ar, ar, v_vals, v_valid, ar, n, n, is_diag=True)


def diag_sparse_store_k(v_vals, v_valid, size, k, n):
    """Sparse k-offset diagonal (n = size + |k|); is_diag only for k == 0,
    which is what the mxm row/col-scaling fast path keys on."""
    ar = jnp.arange(size, dtype=_IDX)
    rows = ar + (0 if k >= 0 else -k)
    cols = ar + (k if k >= 0 else 0)
    return SparseStore(rows, cols, v_vals, v_valid, ar, n, n,
                       is_diag=(k == 0))


def densify(sp, dtype):
    """SparseStore -> (vals, valid) bitmap store.

    Invalid slots are routed to out-of-bounds sentinels BEFORE the scatter
    (mode="drop") — stores fresh from ops can carry an invalid duplicate at
    a live coordinate, and a duplicate-index scatter has undefined winner
    order, so scattering `ok` directly could erase the live entry."""
    shape = (sp.nrows, sp.ncols)
    vals = st.zeros_values(shape, dtype)
    valid = jnp.zeros(shape, bool)
    r = jnp.where(sp.ok, sp.rowids, sp.nrows)
    c = jnp.where(sp.ok, sp.cols, sp.ncols)
    valid = valid.at[r, c].set(True, mode="drop")
    if isinstance(sp.vals, dict):
        vals = {k: vals[k].at[r, c].set(v, mode="drop")
                for k, v in sp.vals.items()}
    else:
        vals = vals.at[r, c].set(sp.vals, mode="drop")
    return vals, valid


def from_dense(vals_host, ok_host, nrows, ncols, dtype):
    """Bitmap host arrays -> SparseStore (host-side; used by sparsity_control)."""
    r, c = np.nonzero(ok_host)
    if isinstance(vals_host, dict):
        v = {k: a[r, c] for k, a in vals_host.items()}
    else:
        v = vals_host[r, c]
    return build_sparse_store(r, c, v, nrows, ncols, dtype)


# --------------------------------------------------------------------- #
# segmented monoid reduction over sorted segment ids
def _indptr(seg, n):
    return jnp.searchsorted(seg, jnp.arange(n + 1, dtype=seg.dtype), side="left")


def _wide_acc(np_dtype):
    """Accumulator dtype for the exact cumsum trick."""
    d = np.dtype(np_dtype)
    if d.kind == "f":
        return np.float64
    if d.kind == "c":
        return np.complex128
    if d.kind == "u":
        return np.uint64
    if d.kind in ("i", "b"):
        return np.int64
    return d


def segment_reduce_sorted(seg, vals, ok, mono, n, in_dt):
    """Monoid-reduce `vals[ok]` grouped by sorted `seg` into n dense slots.

    Returns dense (out_vals[n] in mono.type, out_valid[n]).  Generic over any
    monoid: identity monoids use identity substitution + a segmented
    associative scan (cumsum for plus); the rest carry validity through the
    scan.  No scatters — boundaries come from searchsorted + gathers.
    """
    x = st.cast_values(vals, in_dt, mono.type)
    name = mono.parent.name
    indptr = _indptr(seg, n)
    start, end = indptr[:-1], indptr[1:]
    okc = jnp.concatenate([jnp.zeros(1, jnp.int32),
                           jnp.cumsum(ok.astype(jnp.int32))])
    out_valid = (okc[end] - okc[start]) > 0
    last = jnp.maximum(end - 1, 0)

    ident = None
    if not isinstance(x, dict) and not mono.type._is_udt:
        ident = st.identity_value_array(mono, mono.type)
    if ident is not None:
        xi = jnp.where(ok, x, ident)
        if name == "plus":
            acc = xi.astype(_wide_acc(xi.dtype))
            cs = jnp.concatenate([jnp.zeros(1, acc.dtype), jnp.cumsum(acc)])
            out = (cs[end] - cs[start]).astype(mono.type.np_type)
            return out, out_valid
        combine = mono._jax_func

        def comb(a, b):
            av, aseg = a
            bv, bseg = b
            return jnp.where(aseg == bseg, combine(av, bv), bv), bseg

        sv, _ = jax.lax.associative_scan(comb, (xi, seg))
        out = sv[last]
        if out.dtype != mono.type.np_type:
            out = out.astype(mono.type.np_type)
        return out, out_valid

    # generic validity-carrying segmented scan ('any', UDT monoids)
    combine = None if name == "any" else mono._jax_func

    def comb(a, b):
        av, aok, aseg = a
        bv, bok, bseg = b
        same = aseg == bseg
        both = same & aok & bok
        if combine is None:
            merged = av  # 'any': keep first stored (deterministic)
        else:
            merged = combine(av, bv)
        keep_a = same & aok & ~bok
        v = st.where_values(both, merged, st.where_values(keep_a, av, bv))
        return v, bok | (same & aok), bseg

    sv, sok, _ = jax.lax.associative_scan(comb, (x, ok, seg))
    out = st.tree_take(sv, last, 0)
    return out, out_valid & jnp.take(sok, last)


# --------------------------------------------------------------------- #
# semiring matvec
def spmv(sp_dyn, nrows, ncols, at, kind, u_vals, u_valid, ring, a_dt, u_dt):
    """w = A u (kind='mxv') or w = u A (kind='vxm') with sparse A.

    `at` applies the lazy transpose by swapping coordinate roles.  Returns a
    dense vector store of the output size.
    """
    rowids, cols, vals, ok, csc_perm = sp_dyn
    mult = ring.binaryop
    mono = ring.monoid
    # effective row/col ids of op(A) (A.T swaps)
    eff_rows, eff_cols = (cols, rowids) if at else (rowids, cols)
    # contraction index k and output (destination) index per edge
    if kind == "mxv":
        k_ids, dest = eff_cols, eff_rows
        out_size = ncols if at else nrows
    else:
        k_ids, dest = eff_rows, eff_cols
        out_size = nrows if at else ncols
    # destination-sorted edge order: storage is (row, col)-sorted, so a
    # stored-row destination is already sorted; a stored-col destination
    # rides the precomputed csc_perm gather
    perm = None if dest is rowids else csc_perm

    x = st.tree_take(u_vals, k_ids, 0)
    x_ok = jnp.take(u_valid, k_ids, axis=0, mode="fill", fill_value=False)
    prod_ok = ok & x_ok
    pos = {"i": eff_rows.astype(jnp.int64), "j": jnp.zeros_like(eff_rows, jnp.int64),
           "k": k_ids.astype(jnp.int64)}
    if kind == "vxm":
        pos = {"i": jnp.zeros_like(eff_rows, jnp.int64),
               "j": eff_cols.astype(jnp.int64), "k": k_ids.astype(jnp.int64)}
        prods = dense.apply_binop(mult, x, u_dt, vals, a_dt, pos=pos,
                                  context_map=dense._MATMUL_MAP)
    else:
        pos["j"] = jnp.zeros_like(eff_rows, jnp.int64)
        prods = dense.apply_binop(mult, vals, a_dt, x, u_dt, pos=pos,
                                  context_map=dense._MATMUL_MAP)
    seg = dest.astype(_IDX)
    if perm is not None:
        seg = jnp.take(seg, perm)
        prods = st.tree_take(prods, perm, 0)
        prod_ok = jnp.take(prod_ok, perm)
    return segment_reduce_sorted(seg, prods, prod_ok, mono,
                                 out_size, mult.return_type)


def reduce_axis(sp_dyn, nrows, ncols, at, axis, mono, in_dt):
    """Monoid-reduce rows (axis=1) or columns (axis=0) -> dense vector store."""
    rowids, cols, vals, ok, csc_perm = sp_dyn
    eff_rows, eff_cols = (cols, rowids) if at else (rowids, cols)
    n_r, n_c = (ncols, nrows) if at else (nrows, ncols)
    if axis == 1:  # rowwise
        dest, out_size = eff_rows, n_r
    else:
        dest, out_size = eff_cols, n_c
    # sorted order: CSR order sorts rowids; csc_perm sorts cols
    perm = None if dest is rowids else csc_perm
    seg = dest.astype(_IDX)
    v, o = vals, ok
    if perm is not None:
        seg = jnp.take(seg, perm)
        v = st.tree_take(v, perm, 0)
        o = jnp.take(o, perm)
    return segment_reduce_sorted(seg, v, o, mono, out_size, in_dt)


# --------------------------------------------------------------------- #
# structure-preserving elementwise ops (sparse in -> sparse out)
def _pos_dict(rowids, cols, at):
    i, j = (cols, rowids) if at else (rowids, cols)
    return {"i": i.astype(jnp.int64), "j": j.astype(jnp.int64)}


def apply_unary(sp_dyn, at, op, a_dt):
    rowids, cols, vals, ok, csc_perm = sp_dyn
    out = dense.apply_unop(op, vals, a_dt, pos=_pos_dict(rowids, cols, at))
    return (rowids, cols, out, ok, csc_perm)


def apply_bound(sp_dyn, at, op, a_dt, scalar_val, scalar_dt, left):
    rowids, cols, vals, ok, csc_perm = sp_dyn
    pos = _pos_dict(rowids, cols, at)
    s = jnp.broadcast_to(jnp.asarray(scalar_val), ok.shape)
    if left:
        out = dense.apply_binop(op, s, scalar_dt, vals, a_dt, pos=pos)
    else:
        out = dense.apply_binop(op, vals, a_dt, s, scalar_dt, pos=pos)
    return (rowids, cols, out, ok, csc_perm)


def _indexunary_vals(sp_dyn, at, op, a_dt, thunk_val):
    rowids, cols, vals, ok, csc_perm = sp_dyn
    pos = _pos_dict(rowids, cols, at)
    x = st.cast_values(vals, a_dt, op.type) if op._positional is None else vals
    out = op._jax_func(x, pos["i"], pos["j"], jnp.asarray(thunk_val))
    out_dt = lookup_dtype(out.dtype) if not isinstance(out, dict) else op.return_type
    return st.cast_values(out, out_dt, op.return_type)


def apply_indexunary(sp_dyn, at, op, a_dt, thunk_val):
    rowids, cols, vals, ok, csc_perm = sp_dyn
    out = _indexunary_vals(sp_dyn, at, op, a_dt, thunk_val)
    return (rowids, cols, out, ok, csc_perm)


def select_op(sp_dyn, at, op, a_dt, thunk_val, out_dt):
    rowids, cols, vals, ok, csc_perm = sp_dyn
    pred = _indexunary_vals(sp_dyn, at, op, a_dt, thunk_val)
    return (rowids, cols, st.cast_values(vals, a_dt, out_dt), ok & pred, csc_perm)


def cast_copy(sp_dyn, in_dt, out_dt):
    rowids, cols, vals, ok, csc_perm = sp_dyn
    return (rowids, cols, st.cast_values(vals, in_dt, out_dt), ok, csc_perm)


def transpose(sp_dyn):
    """Materialized transpose: permute to (col, row) order; the new csc_perm
    is the inverse permutation (no host roundtrip)."""
    rowids, cols, vals, ok, csc_perm = sp_dyn
    cap = rowids.shape[0]
    new_rows = jnp.take(cols, csc_perm)
    new_cols = jnp.take(rowids, csc_perm)
    new_vals = st.tree_take(vals, csc_perm, 0)
    new_ok = jnp.take(ok, csc_perm)
    inv = jnp.zeros(cap, _IDX).at[csc_perm].set(jnp.arange(cap, dtype=_IDX))
    return (new_rows, new_cols, new_vals, new_ok, inv)


def ewise_mult_vector_bcast(sp_dyn, at, op, a_dt, v_vals, v_valid, v_dt, *,
                            vector_left=False):
    """A .* broadcast(v along rows): out[i,j] = op(A[i,j], v[j]) (or with the
    vector as the left operand).

    Reference recipe `_m_mult_v` (matrix.py:66) expressed edge-parallel.
    """
    rowids, cols, vals, ok, csc_perm = sp_dyn
    j_ids = rowids if at else cols
    x = st.tree_take(v_vals, j_ids, 0)
    x_ok = jnp.take(v_valid, j_ids, axis=0, mode="fill", fill_value=False)
    pos = _pos_dict(rowids, cols, at)
    if vector_left:
        out = dense.apply_binop(op, x, v_dt, vals, a_dt, pos=pos)
    else:
        out = dense.apply_binop(op, vals, a_dt, x, v_dt, pos=pos)
    return (rowids, cols, out, ok & x_ok, csc_perm)


def ewise_same_structure(a_dyn, b_dyn, variant, op, a_dt, b_dt, out_dt,
                         lr=None):
    """Elementwise op over two stores sharing the same coordinate arrays
    (structure token equality is checked by the dispatcher); reduces to the
    dense engine's elementwise kernels over the cap-length edge arrays."""
    rowids, cols, a_vals, a_ok, csc_perm = a_dyn
    _, _, b_vals, b_ok, _ = b_dyn
    pos = _pos_dict(rowids, cols, False)
    if variant == "mult":
        vals, ok = dense.ewise_mult(a_vals, a_ok, b_vals, b_ok, op, a_dt,
                                    b_dt, pos=pos)
    elif variant == "add":
        vals, ok = dense.ewise_add(a_vals, a_ok, b_vals, b_ok, op, a_dt,
                                   b_dt, out_dt, pos=pos)
    else:
        ldef, rdef = lr
        vals, ok = dense.ewise_union(a_vals, a_ok, b_vals, b_ok, op, a_dt,
                                     b_dt, ldef, rdef, pos=pos)
    return (rowids, cols, vals, ok, csc_perm)


def mxm_diag(sp_dyn, d_dyn, left_diag, at, ring, a_dt, d_dt):
    """D @ A (left_diag) or A @ D: row-/col-scaling with the semiring's
    multiply; the monoid never fires (single k term per output)."""
    rowids, cols, vals, ok, csc_perm = sp_dyn
    d_rowids, d_cols, d_vals, d_ok, _ = d_dyn
    mult = ring.binaryop
    eff_rows, eff_cols = (cols, rowids) if at else (rowids, cols)
    scale_ids = eff_rows if left_diag else eff_cols
    # diag stores are arange-indexed: entry i lives at slot i
    dv = st.tree_take(d_vals, scale_ids, 0)
    dok = jnp.take(d_ok, scale_ids, axis=0, mode="fill", fill_value=False)
    pos = {"i": eff_rows.astype(jnp.int64), "j": eff_cols.astype(jnp.int64)}
    pos["k"] = pos["i"] if left_diag else pos["j"]
    if left_diag:
        out = dense.apply_binop(mult, dv, d_dt, vals, a_dt, pos=pos,
                                context_map=dense._MATMUL_MAP)
    else:
        out = dense.apply_binop(mult, vals, a_dt, dv, d_dt, pos=pos,
                                context_map=dense._MATMUL_MAP)
    out = st.cast_values(out, mult.return_type, ring.monoid.type)
    if at:
        # materialize the transpose so the output store is (row, col)-sorted
        return transpose((rowids, cols, out, ok & dok, csc_perm))
    return (rowids, cols, out, ok & dok, csc_perm)


# --------------------------------------------------------------------- #
# element access
def extract_element(sp_dyn, nrows, ncols, at, i, j):
    """Single-element lookup by binary search over the (row, col)-sorted keys."""
    rowids, cols, vals, ok, _ = sp_dyn
    if at:
        i, j = j, i
    key = rowids.astype(jnp.int64) * (ncols + 1) + cols.astype(jnp.int64)
    target = jnp.asarray(i, jnp.int64) * (ncols + 1) + jnp.asarray(j, jnp.int64)
    pos = jnp.searchsorted(key, target)
    pos_c = jnp.minimum(pos, key.shape[0] - 1)
    hit = (key[pos_c] == target) & jnp.take(ok, pos_c)
    return st.tree_index(vals, pos_c), hit


# ===================================================================== #
# Round-2 scale engine: sorted-COO merge, masked write-back, extract/
# assign, and general SpGEMM — the kernels the reference delegates to
# SuiteSparse's eWise/assign/extract/AxB C engine (reference
# core/matrix.py:1912-2130, 2811-3330, 2206).  All are pure XLA: sorts,
# gathers, searchsorted, and segmented associative scans — no scatters in
# hot paths, no dynamic shapes (caps are static power-of-two buckets).

_I64 = jnp.int64


def _enc(rowids, cols, ncols):
    """Lexicographic (row, col) sort key; padding sentinels sort last."""
    return rowids.astype(_I64) * (ncols + 1) + cols.astype(_I64)


def _sent(nrows, ncols):
    return _I64((nrows + 1)) * (ncols + 1)


def csc_perm_of(rowids, cols, nrows, ncols):
    """Permutation to (col, row) order; sentinel coords sort last."""
    key = cols.astype(_I64) * (nrows + 1) + rowids.astype(_I64)
    return jnp.argsort(key).astype(_IDX)


def _zero_like_vals(vals):
    return jax.tree_util.tree_map(jnp.zeros_like, vals)


def merge_slots(a_dyn, b_dyn, nrows, ncols):
    """Align two sorted-COO stores on the union of their coordinates.

    Returns a dict of per-slot arrays over cap_a+cap_b merged slots, sorted
    by (row, col) with 'a' entries preceding 'b' entries of equal key:
      ks        int64 sort keys (invalid slots -> sentinel)
      rows/cols decoded coordinates (sentinel slots -> (nrows, ncols))
      is_b      slot came from b
      a_val     a's value at the slot (meaningful when ~is_b)
      b_val     b's value at the slot (meaningful when is_b)
      b_pair    b's value at slot t+1 (the b side of a pair rooted at t)
      paired    slot t is the a side of an (a, b) coordinate match
      dup_b     slot t is the b side of a match (always dropped by callers)
      valid     slot carries a real (non-sentinel) entry
    """
    ar, ac, av, aok, _ = a_dyn
    br, bc, bv, bok, _ = b_dyn
    cap_a = ar.shape[0]
    sent = _sent(nrows, ncols)
    ka = jnp.where(aok, _enc(ar, ac, ncols), sent)
    kb = jnp.where(bok, _enc(br, bc, ncols), sent)
    k = jnp.concatenate([ka, kb])
    src_b = jnp.concatenate([jnp.zeros(cap_a, bool),
                             jnp.ones(kb.shape[0], bool)])
    # stable (key, source) order: a precedes b on equal keys
    order = jnp.argsort(k * 2 + src_b)
    ks = jnp.take(k, order)
    is_b = jnp.take(src_b, order)
    valid = ks < sent
    a_idx = jnp.clip(order, 0, cap_a - 1)
    b_idx = jnp.clip(order - cap_a, 0, br.shape[0] - 1)
    a_val = st.tree_take(av, a_idx, 0)
    b_val = st.tree_take(bv, b_idx, 0)
    nxt_same = jnp.concatenate([(ks[1:] == ks[:-1]) & valid[:-1],
                                jnp.zeros(1, bool)])
    prv_same = jnp.concatenate([jnp.zeros(1, bool), ks[1:] == ks[:-1]]) & valid
    b_pair = jax.tree_util.tree_map(lambda x: jnp.roll(x, -1, axis=0), b_val)
    rows = jnp.minimum(ks // (ncols + 1), nrows).astype(_IDX)
    cols_out = jnp.where(valid, ks % (ncols + 1), ncols).astype(_IDX)
    return {
        "ks": ks, "rows": rows, "cols": cols_out, "is_b": is_b,
        "a_val": a_val, "b_val": b_val, "b_pair": b_pair,
        "paired": nxt_same & ~is_b, "dup_b": prv_same & is_b, "valid": valid,
    }


def merge_ewise(a_dyn, b_dyn, nrows, ncols, variant, op, a_dt, b_dt, out_dt,
                lr=None):
    """ewise mult/add/union over two sparse stores with different
    structures (reference matrix.py:1912-2130 -> GrB_eWise*)."""
    m = merge_slots(a_dyn, b_dyn, nrows, ncols)
    pos = {"i": m["rows"].astype(_I64), "j": m["cols"].astype(_I64)}
    combined = dense.apply_binop(op, m["a_val"], a_dt, m["b_pair"], b_dt,
                                 pos=pos)
    combined = st.cast_values(combined, op.return_type, out_dt)
    if variant == "mult":
        out_ok = m["paired"]
        vals = st.where_values(m["paired"], combined,
                               st.cast_values(_zero_like_vals(m["a_val"]),
                                              a_dt, out_dt))
    else:
        single_b = m["is_b"] & ~m["dup_b"] & m["valid"]
        if variant == "add":
            a_pass = st.cast_values(m["a_val"], a_dt, out_dt)
            b_pass = st.cast_values(m["b_val"], b_dt, out_dt)
        else:  # union: singles pair with the defaults
            ldef, ldt, rdef, rdt = lr
            ldef_b = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, m["ks"].shape + x.shape), ldef)
            rdef_b = jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, m["ks"].shape + x.shape), rdef)
            a_pass = st.cast_values(
                dense.apply_binop(op, m["a_val"], a_dt, rdef_b, rdt, pos=pos),
                op.return_type, out_dt)
            b_pass = st.cast_values(
                dense.apply_binop(op, ldef_b, ldt, m["b_val"], b_dt, pos=pos),
                op.return_type, out_dt)
        vals = st.where_values(m["paired"], combined,
                               st.where_values(single_b, b_pass, a_pass))
        out_ok = m["valid"] & ~m["dup_b"]
    csc = csc_perm_of(m["rows"], m["cols"], nrows, ncols)
    return (m["rows"], m["cols"], vals, out_ok, csc)


# --------------------------------------------------------------------- #
# mask evaluation at sparse coordinates
def mask_at(m_dyn, m_dt, structure, complement, nrows, ncols, rowids, cols):
    """Evaluate a (possibly complemented, value or structural) mask whose
    parent is sparse-backed at the given coordinates.  Membership by binary
    search over the mask's sorted keys; checks slot p and p+1 so stores
    whose first-of-equal-keys slot is invalid still answer correctly."""
    mr, mc, mv, mok, _ = m_dyn
    mkey = _enc(mr, mc, ncols)
    target = _enc(rowids, cols, ncols)
    cap = mkey.shape[0]
    p = jnp.searchsorted(mkey, target, side="left")

    def present_at(pp):
        pc = jnp.minimum(pp, cap - 1)
        hit = (jnp.take(mkey, pc) == target) & jnp.take(mok, pc)
        if not structure:
            val = st.tree_take(mv, pc, 0)
            hit = hit & dense.truthy(val, m_dt)
        return hit

    m = present_at(p) | present_at(p + 1)
    return ~m if complement else m


def dense_mask_at(mask_arr, rowids, cols):
    """Gather a dense (already complement-resolved) mask plane at coords."""
    if mask_arr.ndim == 1:
        return jnp.take(mask_arr, rowids, mode="fill", fill_value=False)
    flat = mask_arr.ravel()
    idx = rowids.astype(_I64) * mask_arr.shape[1] + cols.astype(_I64)
    idx = jnp.where((rowids < mask_arr.shape[0]) & (cols < mask_arr.shape[1]),
                    idx, 0)
    got = jnp.take(flat, idx)
    return got & (rowids < mask_arr.shape[0]) & (cols < mask_arr.shape[1])


# --------------------------------------------------------------------- #
# masked/accum write-back onto a sparse target (reference base.py:318-494)
def write_back_sparse(c_dyn, z_dyn, nrows, ncols, c_dt, z_dt, accum, replace,
                      mask_fn):
    """out = GraphBLAS update of sparse C by sparse Z under (mask, accum,
    replace).  mask_fn(rows, cols) -> bool per merged slot, or None."""
    m = merge_slots(c_dyn, z_dyn, nrows, ncols)
    has_c = ~m["is_b"] & m["valid"]
    has_z = m["paired"] | (m["is_b"] & ~m["dup_b"] & m["valid"])
    z_here = st.where_values(m["paired"], m["b_pair"], m["b_val"])
    if mask_fn is None:
        msk = jnp.ones_like(m["valid"])
    else:
        msk = mask_fn(m["rows"], m["cols"])
    c_cast = st.cast_values(m["a_val"], c_dt, c_dt)
    z_cast = st.cast_values(z_here, z_dt, c_dt)
    if accum is None:
        out_ok = jnp.where(msk, has_z, has_c & (not replace))
        vals = st.where_values(msk & has_z, z_cast, c_cast)
    else:
        pos = {"i": m["rows"].astype(_I64), "j": m["cols"].astype(_I64)}
        both = dense.apply_binop(accum, m["a_val"], c_dt, z_here, z_dt, pos=pos)
        both = st.cast_values(both, accum.return_type, c_dt)
        out_ok = jnp.where(msk, has_c | has_z, has_c & (not replace))
        vals = st.where_values(msk & has_c & has_z, both,
                               st.where_values(msk & has_z & ~has_c, z_cast,
                                               c_cast))
    out_ok = out_ok & ~m["dup_b"]
    csc = csc_perm_of(m["rows"], m["cols"], nrows, ncols)
    return (m["rows"], m["cols"], vals, out_ok, csc)


# --------------------------------------------------------------------- #
# compaction: shrink a store to a smaller capacity bucket, keeping order
def compact(dyn, nrows, ncols, new_cap):
    rowids, cols, vals, ok, _ = dyn
    sent = _sent(nrows, ncols)
    key = jnp.where(ok, _enc(rowids, cols, ncols), sent)
    order = jnp.argsort(key)[:new_cap]
    ks = jnp.take(key, order)
    valid = ks < sent
    r = jnp.minimum(ks // (ncols + 1), nrows).astype(_IDX)
    c = jnp.where(valid, ks % (ncols + 1), ncols).astype(_IDX)
    v = st.tree_take(vals, order, 0)
    return (r, c, v, valid, csc_perm_of(r, c, nrows, ncols))


# --------------------------------------------------------------------- #
# extract (reference matrix.py:2811-3330 -> GrB_Matrix_extract)
def extract_submatrix(sp_dyn, nrows, ncols, at, rows, cols, out_nrows,
                      out_ncols):
    """A[rows, cols] on a sparse store with unique index arrays: inverse
    maps + key re-sort.  O(nnz + nrows + ncols), no densification."""
    rowids, cids, vals, ok, _ = sp_dyn
    eff_r, eff_c = (cids, rowids) if at else (rowids, cids)
    inv_r = jnp.full(nrows + 1, -1, _IDX).at[rows].set(
        jnp.arange(rows.shape[0], dtype=_IDX), mode="drop")
    inv_c = jnp.full(ncols + 1, -1, _IDX).at[cols].set(
        jnp.arange(cols.shape[0], dtype=_IDX), mode="drop")
    nr = jnp.take(inv_r, jnp.minimum(eff_r, nrows))
    nc = jnp.take(inv_c, jnp.minimum(eff_c, ncols))
    keep = ok & (nr >= 0) & (nc >= 0)
    sent = _sent(out_nrows, out_ncols)
    key = jnp.where(keep, nr.astype(_I64) * (out_ncols + 1) + nc, sent)
    order = jnp.argsort(key)
    ks = jnp.take(key, order)
    valid = ks < sent
    r = jnp.minimum(ks // (out_ncols + 1), out_nrows).astype(_IDX)
    c = jnp.where(valid, ks % (out_ncols + 1), out_ncols).astype(_IDX)
    v = st.tree_take(vals, order, 0)
    return (r, c, v, valid, csc_perm_of(r, c, out_nrows, out_ncols))


def extract_rowcol_dense(sp_dyn, nrows, ncols, at, fixed_index, idx, axis_row):
    """A[i, cols] (axis_row) or A[rows, j]: one line of a sparse matrix
    gathered into a dense vector store of len(idx)."""
    rowids, cids, vals, ok, _ = sp_dyn
    eff_r, eff_c = (cids, rowids) if at else (rowids, cids)
    if axis_row:
        line_ids, within = eff_r, eff_c
        line_len = ncols if not at else nrows
    else:
        line_ids, within = eff_c, eff_r
        line_len = nrows if not at else ncols
    on_line = ok & (line_ids == fixed_index.astype(line_ids.dtype))
    slot = jnp.where(on_line, within.astype(_I64), line_len)
    line_vals = jax.tree_util.tree_map(
        lambda v: jnp.zeros((line_len + 1,) + v.shape[1:], v.dtype)
        .at[slot].set(v, mode="drop"),
        vals)
    line_ok = jnp.zeros(line_len + 1, bool).at[slot].set(on_line, mode="drop")
    take_idx = jnp.minimum(idx, line_len)
    out_vals = st.tree_take(line_vals, take_idx, 0)
    out_ok = jnp.take(line_ok, take_idx)
    return out_vals, out_ok


# --------------------------------------------------------------------- #
# general sparse SpGEMM (reference matrix.py:2206 -> GrB_mxm; the capped
# Gustavson expansion replaces SuiteSparse's two-phase saxpy kernel)
def _b_ksorted(b_dyn, bt):
    """B's edges in contraction-index (effective-row) sorted order."""
    rowids, cols, vals, ok, csc_perm = b_dyn
    if not bt:
        # stored (row, col) order: effective rows already sorted
        return rowids, cols, vals, ok
    k_ids = jnp.take(cols, csc_perm)
    j_ids = jnp.take(rowids, csc_perm)
    return k_ids, j_ids, st.tree_take(vals, csc_perm, 0), jnp.take(ok, csc_perm)


def spgemm_total(a_dyn, b_dyn, at, bt, k_dim):
    """Phase 1: upper bound on the number of expanded products (device
    scalar).  The host reads this once per mxm dispatch to pick the
    product-buffer capacity bucket — the TPU analog of SuiteSparse's
    symbolic/numeric two-phase SpGEMM."""
    a_rows, a_cols, _, a_ok, _ = a_dyn
    a_k = a_rows if at else a_cols
    b_k, _, _, _ = _b_ksorted(b_dyn, bt)
    indptr_b = jnp.searchsorted(b_k, jnp.arange(k_dim + 1, dtype=b_k.dtype))
    rowlen = indptr_b[1:] - indptr_b[:-1]
    counts = jnp.where(a_ok, jnp.take(rowlen, jnp.minimum(a_k, k_dim - 1),
                                      mode="clip"), 0)
    return jnp.sum(counts.astype(_I64))


def spgemm(a_dyn, b_dyn, at, bt, ring, a_dt, b_dt, out_nrows, out_ncols,
           k_dim, cap_p, mask_fn=None):
    """Phase 2: expand A-edge x B-row products into a cap_p buffer, sort by
    output coordinate, and monoid-combine equal coordinates with a
    segmented associative scan.  mask_fn filters products before the sort
    (mask pushdown: nothing O(nrows*ncols) is ever materialized)."""
    mult = ring.binaryop
    mono = ring.monoid
    a_rows, a_cols, a_vals, a_ok, _ = a_dyn
    a_i = a_cols if at else a_rows
    a_k = a_rows if at else a_cols
    b_k, b_j, b_vals, b_ok = _b_ksorted(b_dyn, bt)
    cap_a = a_i.shape[0]
    cap_b = b_k.shape[0]
    indptr_b = jnp.searchsorted(b_k, jnp.arange(k_dim + 1, dtype=b_k.dtype))
    rowlen = indptr_b[1:] - indptr_b[:-1]
    counts = jnp.where(a_ok, jnp.take(rowlen, jnp.minimum(a_k, k_dim - 1),
                                      mode="clip"), 0).astype(_I64)
    cum = jnp.concatenate([jnp.zeros(1, _I64), jnp.cumsum(counts)])
    total = cum[-1]
    p = jnp.arange(cap_p, dtype=_I64)
    e = jnp.clip(jnp.searchsorted(cum, p, side="right") - 1, 0, cap_a - 1)
    t = p - jnp.take(cum, e)
    ok_p = (p < total) & jnp.take(a_ok, e) & (t < jnp.take(counts, e))
    start = jnp.take(indptr_b, jnp.minimum(jnp.take(a_k, e), k_dim - 1),
                     mode="clip").astype(_I64)
    b_slot = jnp.clip(start + t, 0, cap_b - 1)
    ok_p = ok_p & jnp.take(b_ok, b_slot)
    i = jnp.take(a_i, e)
    j = jnp.take(b_j, b_slot)
    if mask_fn is not None:
        ok_p = ok_p & mask_fn(i, j)
    pos = {"i": i.astype(_I64), "j": j.astype(_I64),
           "k": jnp.take(a_k, e).astype(_I64)}
    av = st.tree_take(a_vals, e, 0)
    bv = st.tree_take(b_vals, b_slot, 0)
    prods = dense.apply_binop(mult, av, a_dt, bv, b_dt, pos=pos,
                              context_map=dense._MATMUL_MAP)
    prods = st.cast_values(prods, mult.return_type, mono.type)
    # sort products by output coordinate; invalid -> sentinel tail
    sent = _sent(out_nrows, out_ncols)
    key = jnp.where(ok_p, i.astype(_I64) * (out_ncols + 1) + j.astype(_I64),
                    sent)
    order = jnp.argsort(key)
    ks = jnp.take(key, order)
    pv = st.tree_take(prods, order, 0)
    # segmented combine: within a run of equal keys every slot is valid
    combine = mono._jax_func

    def comb(a, b):
        avl, akey = a
        bvl, bkey = b
        return st.where_values(akey == bkey, combine_tree(avl, bvl), bvl), bkey

    def combine_tree(x, y):
        if isinstance(x, dict):
            return combine(x, y)
        return combine(x, y)

    sv, _ = jax.lax.associative_scan(comb, (pv, ks))
    valid = ks < sent
    is_last = jnp.concatenate([ks[:-1] != ks[1:], jnp.ones(1, bool)]) & valid
    rows = jnp.minimum(ks // (out_ncols + 1), out_nrows).astype(_IDX)
    cols = jnp.where(valid, ks % (out_ncols + 1), out_ncols).astype(_IDX)
    return (rows, cols, sv, is_last, csc_perm_of(rows, cols, out_nrows,
                                                 out_ncols))


# --------------------------------------------------------------------- #
# mask-bounded SpGEMM: the dot formulation C(M) << A @ B.
#
# For a structural/value (non-complemented) sparse mask, work and memory
# are bounded by the MASK, not by the unmasked expanded-product count: for
# each mask entry (i, j) the shorter of A(i, :) and B(:, j) is expanded and
# each of its contraction indices k is binary-searched in the other side's
# (major, k)-sorted composite keys.  Expansion cost E = sum over mask
# entries of min(deg_A(i), deg_B(j)) — near-linear on power-law graphs
# where the unmasked Gustavson bound sum(deg^2) explodes (VERDICT r2 #4).
# This is the TPU analog of SuiteSparse's axb_method="dot" masked kernel
# (reference graphblas/core/ss/descriptor.py:74-80); the implementation is
# original — sorted-composite binary search + segmented monoid reduction.
def _dot_side(dyn, use_csc, nrows, ncols):
    """Canonical (major, k)-sorted arrays for one side of the dot kernel.

    Canonicalization (compact to same cap) makes valid coordinates unique
    and sorted so a binary search returns the one live slot; stores fresh
    from ops may carry invalid duplicate coordinates."""
    cap = dyn[0].shape[0]
    rowids, cols, vals, ok, csc_perm = compact(dyn, nrows, ncols, cap)
    if use_csc:
        major = jnp.take(cols, csc_perm)
        k = jnp.take(rowids, csc_perm)
        return (major, k, st.tree_take(vals, csc_perm, 0),
                jnp.take(ok, csc_perm))
    return rowids, cols, vals, ok


def _dot_mask_ok(m_dyn, m_dt, structure, out_nrows, out_ncols):
    mr, mc, mv, mok, _ = m_dyn
    ok_m = mok & (mr < out_nrows) & (mc < out_ncols)
    if not structure:
        from . import dense

        ok_m = ok_m & dense.truthy(mv, m_dt)
    return ok_m


def _dot_degrees(a_dyn, b_dyn, m_dyn, m_dt, structure, at, bt,
                 out_nrows, out_ncols, k_dim):
    a_nrows, a_ncols = (k_dim, out_nrows) if at else (out_nrows, k_dim)
    b_nrows, b_ncols = (out_ncols, k_dim) if bt else (k_dim, out_ncols)
    a_side = _dot_side(a_dyn, at, a_nrows, a_ncols)
    b_side = _dot_side(b_dyn, not bt, b_nrows, b_ncols)
    indptr_a = jnp.searchsorted(a_side[0], jnp.arange(out_nrows + 1,
                                                      dtype=_IDX))
    indptr_b = jnp.searchsorted(b_side[0], jnp.arange(out_ncols + 1,
                                                      dtype=_IDX))
    deg_a = (indptr_a[1:] - indptr_a[:-1]).astype(_I64)
    deg_b = (indptr_b[1:] - indptr_b[:-1]).astype(_I64)
    mr, mc = m_dyn[0], m_dyn[1]
    ok_m = _dot_mask_ok(m_dyn, m_dt, structure, out_nrows, out_ncols)
    da = jnp.take(deg_a, jnp.minimum(mr, out_nrows - 1).astype(_IDX))
    db = jnp.take(deg_b, jnp.minimum(mc, out_ncols - 1).astype(_IDX))
    cnt = jnp.where(ok_m, jnp.minimum(da, db), 0)
    return a_side, b_side, indptr_a, indptr_b, ok_m, da, db, cnt


def spgemm_dot_total(a_dyn, b_dyn, m_dyn, m_dt, structure, at, bt,
                     out_nrows, out_ncols, k_dim):
    """Phase 1 for the dot formulation: [gustavson_total, dot_total] so the
    host can pick the cheaper formulation with one device read."""
    gus = spgemm_total(a_dyn, b_dyn, at, bt, k_dim)
    cnt = _dot_degrees(a_dyn, b_dyn, m_dyn, m_dt, structure, at, bt,
                       out_nrows, out_ncols, k_dim)[-1]
    return jnp.stack([gus, jnp.sum(cnt)])


def spgemm_masked_dot(a_dyn, b_dyn, m_dyn, at, bt, ring, a_dt, b_dt,
                      m_dt, structure, out_nrows, out_ncols, k_dim, cap_e):
    """Phase 2 of the masked dot SpGEMM.  Output has the mask's (canonical)
    coordinate layout and capacity; a slot is valid iff its dot product has
    at least one surviving term (GraphBLAS mxm structure semantics)."""
    from . import dense

    mult = ring.binaryop
    mono = ring.monoid
    m_can = compact(m_dyn, out_nrows, out_ncols, m_dyn[0].shape[0])
    (a_side, b_side, indptr_a, indptr_b, ok_m, da, db,
     cnt) = _dot_degrees(a_dyn, b_dyn, m_can, m_dt, structure, at, bt,
                         out_nrows, out_ncols, k_dim)
    a_major, a_k, a_vals, a_ok = a_side
    b_major, b_k, b_vals, b_ok = b_side
    cap_a = a_major.shape[0]
    cap_b = b_major.shape[0]
    mr, mc, _, _, m_csc = m_can
    cap_m = mr.shape[0]

    cum = jnp.concatenate([jnp.zeros(1, _I64), jnp.cumsum(cnt)])
    total = cum[-1]
    p = jnp.arange(cap_e, dtype=_I64)
    mo = jnp.clip(jnp.searchsorted(cum, p, side="right") - 1,
                  0, cap_m - 1).astype(_IDX)
    t = p - jnp.take(cum, mo)
    ok_p = (p < total) & (t < jnp.take(cnt, mo))
    i_p = jnp.take(mr, mo)
    j_p = jnp.take(mc, mo)
    ua = jnp.take(da <= db, mo)  # expand the A side when its row is shorter

    sa = jnp.clip(jnp.take(indptr_a, jnp.minimum(i_p, out_nrows - 1)
                           .astype(_IDX)).astype(_I64) + t, 0, cap_a - 1)
    sb = jnp.clip(jnp.take(indptr_b, jnp.minimum(j_p, out_ncols - 1)
                           .astype(_IDX)).astype(_I64) + t, 0, cap_b - 1)
    ka = jnp.take(a_k, sa)
    kb = jnp.take(b_k, sb)
    k_p = jnp.where(ua, ka, kb)
    ok_pos = jnp.where(ua, jnp.take(a_ok, sa), jnp.take(b_ok, sb))

    kd1 = _I64(k_dim + 1)
    comp_a = a_major.astype(_I64) * kd1 + a_k.astype(_I64)
    comp_b = b_major.astype(_I64) * kd1 + b_k.astype(_I64)
    tgt_b = j_p.astype(_I64) * kd1 + ka.astype(_I64)
    tgt_a = i_p.astype(_I64) * kd1 + kb.astype(_I64)
    qb = jnp.minimum(jnp.searchsorted(comp_b, tgt_b), cap_b - 1)
    qa = jnp.minimum(jnp.searchsorted(comp_a, tgt_a), cap_a - 1)
    hit_b = (jnp.take(comp_b, qb) == tgt_b) & jnp.take(b_ok, qb)
    hit_a = (jnp.take(comp_a, qa) == tgt_a) & jnp.take(a_ok, qa)
    found = jnp.where(ua, hit_b, hit_a)

    av = st.where_values(ua, st.tree_take(a_vals, sa, 0),
                         st.tree_take(a_vals, qa, 0))
    bv = st.where_values(ua, st.tree_take(b_vals, qb, 0),
                         st.tree_take(b_vals, sb, 0))
    live = ok_p & ok_pos & found
    pos = {"i": i_p.astype(_I64), "j": j_p.astype(_I64),
           "k": k_p.astype(_I64)}
    prods = dense.apply_binop(mult, av, a_dt, bv, b_dt, pos=pos,
                              context_map=dense._MATMUL_MAP)
    out_vals, out_valid = segment_reduce_sorted(
        mo, prods, live, mono, cap_m, mult.return_type)
    return (mr, mc, out_vals, out_valid & ok_m, m_csc)


# --------------------------------------------------------------------- #
# assign (reference matrix.py:2905+ -> GrB_Matrix_assign / GxB_subassign)
def region_store(rows, cols, v_vals, v_ok, nrows, ncols):
    """Scatter a dense region-shaped value plane onto C-space coordinates,
    returning a sorted padded-COO dyn of cap len(rows)*len(cols)."""
    R = rows.shape[0]
    C = cols.shape[0]
    ridx = jnp.arange(R * C, dtype=_I64) // C
    cidx = jnp.arange(R * C, dtype=_I64) % C
    rr = jnp.take(rows, ridx).astype(_IDX)
    cc = jnp.take(cols, cidx).astype(_IDX)
    flat_ok = v_ok.reshape(R * C)
    flat_vals = jax.tree_util.tree_map(
        lambda a: a.reshape((R * C,) + a.shape[v_ok.ndim:]), v_vals)
    sent = _sent(nrows, ncols)
    key = jnp.where(flat_ok, _enc(rr, cc, ncols), sent)
    order = jnp.argsort(key)
    ks = jnp.take(key, order)
    valid = ks < sent
    r = jnp.minimum(ks // (ncols + 1), nrows).astype(_IDX)
    c = jnp.where(valid, ks % (ncols + 1), ncols).astype(_IDX)
    v = st.tree_take(flat_vals, order, 0)
    return (r, c, v, valid, csc_perm_of(r, c, nrows, ncols))


def assign_sparse(c_dyn, z_dyn, nrows, ncols, c_dt, z_dt, accum, replace,
                  mask_fn, in_region_fn, submask):
    """Assign sparse/dense-region content Z into sparse C.

    Semantics (GrB_assign): Zplane = C with the region's content replaced
    by Z (accum merges within the region); then the standard
    mask/replace write of Zplane into C.  GxB_subassign (submask) scopes
    mask and replace to the region only."""
    m = merge_slots(c_dyn, z_dyn, nrows, ncols)
    has_c = ~m["is_b"] & m["valid"]
    has_z = m["paired"] | (m["is_b"] & ~m["dup_b"] & m["valid"])
    z_here = st.where_values(m["paired"], m["b_pair"], m["b_val"])
    in_region = in_region_fn(m["rows"], m["cols"]) | has_z
    msk = (jnp.ones_like(m["valid"]) if mask_fn is None
           else mask_fn(m["rows"], m["cols"]))
    c_val = m["a_val"]
    z_cast = st.cast_values(z_here, z_dt, c_dt)
    if accum is None:
        zp_ok = jnp.where(in_region, has_z, has_c)
        zp_val = st.where_values(in_region & has_z, z_cast, c_val)
    else:
        pos = {"i": m["rows"].astype(_I64), "j": m["cols"].astype(_I64)}
        both = dense.apply_binop(accum, c_val, c_dt, z_here, z_dt, pos=pos)
        both = st.cast_values(both, accum.return_type, c_dt)
        zp_ok = jnp.where(in_region, has_c | has_z, has_c)
        zp_val = st.where_values(in_region & has_c & has_z, both,
                                 st.where_values(in_region & has_z & ~has_c,
                                                 z_cast, c_val))
    if submask:
        take_zp = in_region & msk
        out_ok = jnp.where(in_region,
                           jnp.where(msk, zp_ok, has_c & (not replace)),
                           has_c)
    else:
        take_zp = msk
        out_ok = jnp.where(msk, zp_ok, has_c & (not replace))
    vals = st.where_values(take_zp, zp_val, c_val)
    out_ok = out_ok & ~m["dup_b"]
    csc = csc_perm_of(m["rows"], m["cols"], nrows, ncols)
    return (m["rows"], m["cols"], vals, out_ok, csc)


def membership_fn(idx_arrays, nrows, ncols):
    """in_region(rows, cols) from per-axis index arrays (device)."""
    rows_arr, cols_arr = idx_arrays
    in_r = jnp.zeros(nrows + 1, bool).at[rows_arr].set(True, mode="drop")
    in_c = jnp.zeros(ncols + 1, bool).at[cols_arr].set(True, mode="drop")

    def fn(r, c):
        return (jnp.take(in_r, jnp.minimum(r, nrows))
                & jnp.take(in_c, jnp.minimum(c, ncols)))

    return fn


def ewise_mult_sparse_dense(sp_dyn, at, op, sp_dt, d_vals, d_valid, d_dt,
                            sparse_left=True):
    """Sparse .* dense-bitmap: gather the dense plane at the sparse
    coordinates (structure of the result is a subset of the sparse one)."""
    rowids, cols, vals, ok, csc_perm = sp_dyn
    i = cols if at else rowids
    j = rowids if at else cols
    nr = d_valid.shape[0]
    nc = d_valid.shape[1] if d_valid.ndim > 1 else 1
    flat_idx = jnp.minimum(i.astype(_I64), nr - 1) * nc + jnp.minimum(
        j.astype(_I64), nc - 1)
    dv = st.tree_take(
        jax.tree_util.tree_map(lambda a: a.reshape((nr * nc,) + a.shape[2:]),
                               d_vals), flat_idx, 0)
    d_ok = jnp.take(d_valid.reshape(nr * nc), flat_idx)
    d_ok = d_ok & (i < nr) & (j < nc)
    pos = {"i": i.astype(_I64), "j": j.astype(_I64)}
    if sparse_left:
        out = dense.apply_binop(op, vals, sp_dt, dv, d_dt, pos=pos)
    else:
        out = dense.apply_binop(op, dv, d_dt, vals, sp_dt, pos=pos)
    return (rowids, cols, out, ok & d_ok, csc_perm)


def densify_dyn(dyn, nrows, ncols, dtype):
    """Dyn-tuple variant of densify() usable inside jit.  Invalid slots are
    routed out of bounds before the scatter (see densify: a duplicate-index
    scatter has undefined winner order)."""
    rowids, cols, vals, ok, _ = dyn
    shape = (nrows, ncols)
    out_vals = st.zeros_values(shape, dtype)
    r = jnp.where(ok, rowids, nrows)
    c = jnp.where(ok, cols, ncols)
    valid = jnp.zeros(shape, bool).at[r, c].set(True, mode="drop")
    if isinstance(vals, dict):
        out_vals = {k: out_vals[k].at[r, c].set(v, mode="drop")
                    for k, v in vals.items()}
    else:
        out_vals = out_vals.at[r, c].set(vals, mode="drop")
    return out_vals, valid
