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
                 "cap", "is_diag", "token")

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
        return int(np.asarray(jnp.sum(self.ok)))

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
    return SparseStore(jnp.asarray(r), jnp.asarray(c), vals, jnp.asarray(ok),
                       jnp.asarray(csc_perm), nrows, ncols, is_diag=is_diag)


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
    """SparseStore -> (vals, valid) bitmap store (device scatter; padding and
    invalid entries drop out via the valid plane / OOB-drop semantics)."""
    shape = (sp.nrows, sp.ncols)
    vals = st.zeros_values(shape, dtype)
    valid = jnp.zeros(shape, bool)
    r, c = sp.rowids, sp.cols
    valid = valid.at[r, c].set(sp.ok, mode="drop")
    if isinstance(sp.vals, dict):
        vals = {k: vals[k].at[r, c].set(v, mode="drop") for k, v in sp.vals.items()}
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
