"""Matrix.ss: storage-format control and data-plane utilities.

Parity target: reference core/ss/matrix.py (SURVEY §2 row 15): import/export
for the 10 storage formats (Appendix C field schemas), split/concat tiling,
selectk/compactify/sort, scan, flatten/reshape, serialize/deserialize,
iterators, build_diag/build_scalar, per-object config.
"""

import pickle
import zlib

import numpy as np

from ...exceptions import InvalidValue
from ..dtypes import lookup_dtype
from ..utils import normalize_chunks


class MatrixConfig(dict):
    """Per-matrix config mapping (reference core/ss/matrix.py:124-180).

    ``sparsity_control`` is LIVE: setting it to "sparse"/"hypersparse"
    converts the backing to the padded-CSR store, "bitmap"/"full"
    densifies (dense_limit-guarded), and "auto" defers to the
    ``auto_sparse_limit`` policy.  ``sparsity_status`` reports the actual
    backing.  This is the per-object tier of the reference's 3-tier config
    system (SURVEY §5)."""

    _defaults = {
        "format": "bitmapr",
        "sparsity_control": "auto",
        "hyper_switch": 0.0625,
        "bitmap_switch": 0.04,
    }
    _SPARSITY = {"auto", "sparse", "hypersparse", "bitmap", "full"}

    def __init__(self, parent):
        super().__init__(self._defaults)
        self._parent = parent

    def __getitem__(self, key):
        if key == "sparsity_status":
            return ("sparse" if self._parent._sparse is not None
                    else "bitmap")
        if key == "format":
            return self._parent.ss.format
        return super().__getitem__(key)

    def __setitem__(self, key, value):
        if key == "sparsity_status":
            raise InvalidValue("sparsity_status is read-only")
        if key == "sparsity_control":
            if value not in self._SPARSITY:
                raise InvalidValue(
                    f"Invalid sparsity_control: {value!r}; must be one of "
                    f"{sorted(self._SPARSITY)}")
            p = self._parent
            if value in ("sparse", "hypersparse") and p._sparse is None:
                from .. import execute

                execute._sparsify(p)
            elif value in ("bitmap", "full") and p._sparse is not None:
                p._densify()
        super().__setitem__(key, value)


class MatrixSS:
    __slots__ = "_parent", "config", "__weakref__"

    def __init__(self, parent):
        self._parent = parent
        self.config = MatrixConfig(parent)

    # ------------------------------------------------------------------ #
    def _hypersparse(self):
        """Sparsity-status rule (reference core/ss/matrix.py:558-564):
        hypersparse when forced by sparsity_control, or in auto mode when
        the fraction of non-empty rows is below hyper_switch."""
        p = self._parent
        if p._sparse is None:
            return False
        ctl = self.config.get("sparsity_control", "auto")
        if ctl == "hypersparse":
            return True
        if ctl != "auto" or p.nrows == 0:
            return False
        import numpy as np

        r, _, _ = p._sparse.host_coo()
        nvec = len(np.unique(r))
        return nvec < self.config.get("hyper_switch", 0.0625) * p.nrows

    @property
    def format(self):
        if self._parent._sparse is not None:
            return "hypercsr" if self._hypersparse() else "csr"
        return "bitmapr"

    @property
    def orientation(self):
        return "rowwise"

    @property
    def nbytes(self):
        p = self._parent
        if p._sparse is not None:
            sp = p._sparse
            return sp.cap * (p.dtype.np_type.itemsize + 2 * 4 + 1)
        return p.nrows * p.ncols * (p.dtype.np_type.itemsize + 1)

    def _present_values(self):
        """Host array of stored values — O(nnz) when sparse-backed, never
        densifying a graph-scale matrix (Appendix C interchange contract)."""
        p = self._parent
        if p._sparse is not None:
            _, _, v = p._sparse.host_coo()
            return v
        vals, ok = p._host_arrays()
        return vals[ok]

    @property
    def is_iso(self):
        pres = self._present_values()
        if isinstance(pres, dict):
            return False
        if len(pres) == 0:
            return False
        return bool((pres == pres.flat[0]).all())

    @property
    def iso_value(self):
        from ..scalar import Scalar

        pres = self._present_values()
        if len(pres) == 0 or not (pres == pres.flat[0]).all():
            raise ValueError("Matrix is not iso-valued")
        return Scalar.from_value(pres.flat[0], self._parent.dtype)

    # ------------------------------------------------------------------ #
    def export(self, format=None, *, sort=True, give_ownership=False, raw=False):
        """Export as plain dicts of numpy arrays (Appendix C schemas).

        ``is_iso`` is reported accurately, but values are always exported
        untrimmed (the reference trims iso exports to one element; the import
        path here accepts both forms).
        """
        p = self._parent
        if format is None or format in ("rowwise",):
            format = "hypercsr" if self._hypersparse() else "csr"
        elif format == "columnwise":
            format = "csc"
        format = format.lower()
        if format in ("bitmapr", "bitmapc", "fullr", "fullc"):
            # only the dense formats need O(nrows*ncols) host arrays;
            # csr/csc/hyper/coo stay O(nnz) for sparse-backed matrices
            vals, ok = p._host_arrays()
        iso = self.is_iso
        if format == "csr":
            indptr, cols, v = p.to_csr()
            rv = {
                "indptr": indptr, "col_indices": cols, "values": v,
                "sorted_cols": True, "nrows": p.nrows, "ncols": p.ncols,
                "is_iso": iso, "format": "csr",
            }
        elif format == "csc":
            indptr, rows, v = p.to_csc()
            rv = {
                "indptr": indptr, "row_indices": rows, "values": v,
                "sorted_rows": True, "nrows": p.nrows, "ncols": p.ncols,
                "is_iso": iso, "format": "csc",
            }
        elif format == "hypercsr":
            rows, indptr, cols, v = p.to_dcsr()
            rv = {
                "rows": rows, "indptr": indptr, "col_indices": cols, "values": v,
                "sorted_cols": True, "nrows": p.nrows, "ncols": p.ncols,
                "is_iso": iso, "format": "hypercsr",
            }
            if raw:
                rv["nvec"] = len(rows)
        elif format == "hypercsc":
            cols, indptr, rows, v = p.to_dcsc()
            rv = {
                "cols": cols, "indptr": indptr, "row_indices": rows, "values": v,
                "sorted_rows": True, "nrows": p.nrows, "ncols": p.ncols,
                "is_iso": iso, "format": "hypercsc",
            }
            if raw:
                rv["nvec"] = len(cols)
        elif format in ("bitmapr", "bitmapc"):
            order = "C" if format == "bitmapr" else "F"
            rv = {
                "bitmap": np.array(ok, order=order),
                "values": np.array(vals, order=order),
                "nvals": int(ok.sum()), "nrows": p.nrows, "ncols": p.ncols,
                "is_iso": iso, "format": format,
            }
        elif format in ("fullr", "fullc"):
            if not ok.all():
                raise InvalidValue(f"Matrix is not full; cannot export as {format}")
            order = "C" if format == "fullr" else "F"
            rv = {"values": np.array(vals, order=order), "nrows": p.nrows,
                  "ncols": p.ncols, "is_iso": iso, "format": format}
        elif format in ("coor", "cooc", "coo"):
            r, c, v = p.to_coo()
            if format == "cooc":
                order = np.lexsort((r, c))
                r, c, v = r[order], c[order], v[order]
            rv = {"rows": r, "cols": c, "values": v, "nrows": p.nrows,
                  "ncols": p.ncols, "sorted_rows": format != "cooc",
                  "sorted_cols": format == "cooc",
                  "is_iso": iso, "format": format}
        else:
            raise ValueError(f"Invalid format: {format}")
        if give_ownership:
            p.clear()
        return rv

    def unpack(self, format=None, *, sort=True, raw=False):
        """Like export(give_ownership=True): parent is left valid-but-empty
        (reference core/ss/matrix.py:731-737)."""
        return self.export(format, sort=sort, give_ownership=True, raw=raw)

    def unpack_hyperhash(self, *, compute=False, name=None):
        """Hyper-hash acceleration structure (reference core/ss/matrix.py
        :3664: GxB_unpack_HyperHash).

        The engine keeps no cached hyper-hash (lookups go through device
        gathers, not host hashing), so with ``compute=False`` this returns
        None exactly like the reference does for a matrix without one.
        ``compute=True`` builds and returns the structure for a
        hypersparse matrix: an INT64 Matrix of shape (table_size, 2)
        using open addressing — row t holds (row id, position in the
        hypercsr ``rows`` list) for the hyperlist entry hashed to slot t
        (linear probing; table_size is the power of two >= 2*nvec).  A
        matrix that would not export as hypercsr returns None.
        """
        if not compute:
            return None
        exp = self.export("rowwise")
        if exp.get("format") != "hypercsr":
            return None
        import numpy as np

        from ..matrix import Matrix

        rows = np.asarray(exp["rows"], np.int64)
        nvec = len(rows)
        size = 1
        while size < max(2 * nvec, 1):
            size *= 2
        mask = size - 1
        table_r = np.full(size, -1, np.int64)
        table_k = np.full(size, -1, np.int64)
        for k, r in enumerate(rows):
            h = (int(r) * 0x9E3779B1) & mask
            while table_r[h] >= 0:
                h = (h + 1) & mask
            table_r[h] = r
            table_k[h] = k
        occ = np.flatnonzero(table_r >= 0)
        return Matrix.from_coo(
            np.repeat(occ, 2), np.tile(np.array([0, 1]), len(occ)),
            np.stack([table_r[occ], table_k[occ]], axis=1).reshape(-1),
            dtype="INT64", nrows=size, ncols=2,
            name=name or "hyper_hash")

    @classmethod
    def import_any(cls, **kwargs):
        from ..matrix import Matrix

        fmt = kwargs.get("format")
        if fmt is None:
            if "indptr" in kwargs:
                if "rows" in kwargs:
                    fmt = "hypercsr"
                elif "cols" in kwargs:
                    fmt = "hypercsc"
                elif "col_indices" in kwargs:
                    fmt = "csr"
                else:
                    fmt = "csc"
            elif "bitmap" in kwargs:
                fmt = "bitmapr"
            elif "rows" in kwargs or "cols" in kwargs:
                fmt = "coor"
            else:
                fmt = "fullr"
        fmt = fmt.lower()
        nrows = kwargs.get("nrows")
        ncols = kwargs.get("ncols")
        dtype = kwargs.get("dtype")
        is_iso = bool(kwargs.get("is_iso", False))

        def _values(n):
            # iso blobs (reference-style) may carry a single stored value
            v = np.asarray(kwargs["values"])
            if is_iso and v.size >= 1 and (v.ndim == 0 or len(v) != n):
                v = np.broadcast_to(v.reshape(-1)[:1], (n,) + v.shape[1:])
            return v

        if fmt == "csr":
            indptr = np.asarray(kwargs["indptr"], np.int64)
            return Matrix.from_csr(indptr, kwargs["col_indices"],
                                   _values(int(indptr[-1])),
                                   dtype, nrows=nrows, ncols=ncols)
        if fmt == "csc":
            indptr = np.asarray(kwargs["indptr"], np.int64)
            return Matrix.from_csc(indptr, kwargs["row_indices"],
                                   _values(int(indptr[-1])),
                                   dtype, nrows=nrows, ncols=ncols)
        if fmt == "hypercsr":
            rows = np.asarray(kwargs["rows"], np.int64)
            indptr = np.asarray(kwargs["indptr"], np.int64)
            nvec = int(kwargs.get("nvec", len(rows)))
            return Matrix.from_dcsr(rows[:nvec], indptr[: nvec + 1],
                                    kwargs["col_indices"],
                                    _values(int(indptr[nvec])), dtype,
                                    nrows=nrows, ncols=ncols)
        if fmt == "hypercsc":
            cols = np.asarray(kwargs["cols"], np.int64)
            indptr = np.asarray(kwargs["indptr"], np.int64)
            nvec = int(kwargs.get("nvec", len(cols)))
            return Matrix.from_dcsc(cols[:nvec], indptr[: nvec + 1],
                                    kwargs["row_indices"],
                                    _values(int(indptr[nvec])), dtype,
                                    nrows=nrows, ncols=ncols)
        if fmt in ("bitmapr", "bitmapc"):
            import jax.numpy as jnp

            from ..engine import store as st

            bitmap = np.asarray(kwargs["bitmap"], bool)
            vals = np.asarray(kwargs["values"])
            if bitmap.ndim == 1:
                bitmap = bitmap.reshape(nrows, ncols)
            if is_iso and vals.shape != bitmap.shape:
                vals = np.broadcast_to(vals.reshape(-1)[:1], bitmap.shape)
            elif vals.ndim == 1:
                vals = vals.reshape(bitmap.shape)
            dt = lookup_dtype(dtype) if dtype is not None else lookup_dtype(vals.dtype)
            m = Matrix(dt, bitmap.shape[0], bitmap.shape[1])
            m._set_store(st.np_values_to_device(np.ascontiguousarray(vals).astype(dt.np_type), dt),
                         jnp.asarray(bitmap))
            return m
        if fmt in ("fullr", "fullc"):
            vals = np.asarray(kwargs["values"])
            if is_iso and (nrows is not None and vals.shape != (nrows, ncols)):
                vals = np.broadcast_to(vals.reshape(-1)[:1], (nrows, ncols))
            elif vals.ndim == 1 and nrows is not None:
                vals = vals.reshape(nrows, ncols)
            return Matrix.from_dense(np.ascontiguousarray(vals), dtype=dtype)
        if fmt in ("coor", "cooc", "coo"):
            rows = np.asarray(kwargs["rows"], np.int64)
            return Matrix.from_coo(rows, np.asarray(kwargs["cols"], np.int64),
                                   _values(len(rows)),
                                   dtype, nrows=nrows, ncols=ncols)
        raise ValueError(f"Invalid format: {fmt}")

    # per-format named importers (reference core/ss/matrix.py:1165-3220);
    # the dict-schema dispatcher handles every format, so the named variants
    # pin the format and share it
    def _make_importer(fmt):  # noqa: N805 — used only at class-build time
        def _import(cls, **kwargs):
            kwargs["format"] = fmt
            return MatrixSS.import_any.__func__(cls, **kwargs)

        _import.__name__ = f"import_{fmt}"
        _import.__doc__ = f"Import a Matrix from the `{fmt}` field schema (Appendix C)."
        return classmethod(_import)

    import_csr = _make_importer("csr")
    import_csc = _make_importer("csc")
    import_hypercsr = _make_importer("hypercsr")
    import_hypercsc = _make_importer("hypercsc")
    import_bitmapr = _make_importer("bitmapr")
    import_bitmapc = _make_importer("bitmapc")
    import_fullr = _make_importer("fullr")
    import_fullc = _make_importer("fullc")
    import_coor = _make_importer("coor")
    import_cooc = _make_importer("cooc")
    import_coo = _make_importer("coo")
    del _make_importer

    def pack_any(self, **kwargs):
        """Repopulate the parent in place from a field-schema dict
        (reference pack_* leave the shell valid; inverse of unpack)."""
        p = self._parent
        kwargs.setdefault("nrows", p.nrows)
        kwargs.setdefault("ncols", p.ncols)
        kwargs.setdefault("dtype", p.dtype)
        m = self.import_any(**kwargs)
        p._set_store(m._vals, m._valid)
        p._nrows, p._ncols = m.nrows, m.ncols

    def _make_packer(fmt):  # noqa: N805
        def _pack(self, **kwargs):
            kwargs["format"] = fmt
            return MatrixSS.pack_any(self, **kwargs)

        _pack.__name__ = f"pack_{fmt}"
        _pack.__doc__ = f"Repopulate the parent from the `{fmt}` field schema."
        return _pack

    pack_csr = _make_packer("csr")
    pack_csc = _make_packer("csc")
    pack_hypercsr = _make_packer("hypercsr")
    pack_hypercsc = _make_packer("hypercsc")
    pack_bitmapr = _make_packer("bitmapr")
    pack_bitmapc = _make_packer("bitmapc")
    pack_fullr = _make_packer("fullr")
    pack_fullc = _make_packer("fullc")
    pack_coor = _make_packer("coor")
    pack_cooc = _make_packer("cooc")
    pack_coo = _make_packer("coo")
    del _make_packer

    # ------------------------------------------------------------------ #
    def split(self, chunks, *, name=None):
        """Split into a 2-D list of tiles (reference core/ss/matrix.py:281)."""
        from ..matrix import Matrix

        p = self._parent
        chunkspec = normalize_chunks(chunks, p.shape)
        row_sizes, col_sizes = chunkspec
        tiles = []
        r0 = 0
        for rs in row_sizes:
            row_tiles = []
            c0 = 0
            for cs in col_sizes:
                vals = p._vals[r0:r0 + rs, c0:c0 + cs]
                ok = p._valid[r0:r0 + rs, c0:c0 + cs]
                row_tiles.append(Matrix._from_store(p.dtype, vals, ok))
                c0 += cs
            tiles.append(row_tiles)
            r0 += rs
        return tiles

    def concat(self, tiles):
        """Fill the parent by concatenating a 2-D grid of Matrix tiles
        (reference core/ss/matrix.py:363); inverse of split()."""
        from ...ss import concat as _concat

        p = self._parent
        m = _concat(tiles, dtype=p.dtype)
        if m.shape != p.shape:
            raise ValueError(
                f"tiles concatenate to shape {m.shape}, expected {p.shape}")
        p._set_store(m._vals, m._valid)

    def build_diag(self, vector, k=0):
        """Reference core/ss/matrix.py:252."""
        p = self._parent
        d = vector.diag(k)
        p._set_store(d._vals, d._valid)
        p._nrows, p._ncols = d.shape

    def build_scalar(self, rows, columns, value):
        """Iso build (reference core/ss/matrix.py:383)."""
        rows = np.asarray(rows, np.int64)
        self._parent.build(rows, np.asarray(columns, np.int64),
                           np.broadcast_to(np.asarray(value), rows.shape))

    # ------------------------------------------------------------------ #
    def iterkeys(self, seek=0):
        r, c, _ = self._parent.to_coo()
        for i in range(seek, len(r)):
            yield (int(r[i]), int(c[i]))

    def itervalues(self, seek=0):
        _, _, v = self._parent.to_coo()
        for i in range(seek, len(v)):
            yield v[i]

    def iteritems(self, seek=0):
        r, c, v = self._parent.to_coo()
        for i in range(seek, len(r)):
            yield ((int(r[i]), int(c[i])), v[i])

    def head(self, n=10, dtype=None, *, sort=False):
        r, c, v = self._parent.to_coo(dtype)
        return r[:n], c[:n], v[:n]

    # ------------------------------------------------------------------ #
    def flatten(self, order="rowwise", *, name=None):
        """Reference core/ss/matrix.py:3717."""
        from ..vector import Vector

        p = self._parent
        vals, ok = p._vals, p._valid
        if order in ("columnwise", "F", "col"):
            vals = vals.T
            ok = ok.T
        return Vector._from_store(p.dtype, vals.reshape(-1), ok.reshape(-1),
                                  name=name)

    def reshape(self, nrows, ncols=None, order="rowwise", *, name=None):
        """Reference core/ss/matrix.py:3742."""
        from ..matrix import Matrix

        p = self._parent
        if ncols is None:
            if isinstance(nrows, tuple):
                nrows, ncols = nrows
            else:
                ncols = p.nrows * p.ncols // nrows
        nrows, ncols = int(nrows), int(ncols)
        if nrows * ncols != p.nrows * p.ncols:
            raise ValueError(
                f"Cannot reshape {p.shape} into ({nrows}, {ncols}): "
                "total number of elements must be unchanged"
            )
        vals, ok = p._vals, p._valid
        if order in ("columnwise", "F", "col"):
            vals = vals.T.reshape(ncols, nrows).T
            ok = ok.T.reshape(ncols, nrows).T
        else:
            vals = vals.reshape(nrows, ncols)
            ok = ok.reshape(nrows, ncols)
        return Matrix._from_store(p.dtype, vals, ok, name=name)

    # ------------------------------------------------------------------ #
    @staticmethod
    def _rng_keys(shape):
        import jax.numpy as jnp

        return jnp.asarray(
            np.random.default_rng().random(shape, dtype=np.float32))

    def selectk(self, how, k, *, name=None):
        """Select k elements per row (reference core/ss/matrix.py:3815).
        how: first/last/smallest/largest/random.  Runs as a vectorized
        on-device sort kernel (engine/dense.py rowwise_selectk)."""
        from ..engine import dense
        from ..matrix import Matrix

        p = self._parent
        if how not in ("first", "last", "smallest", "largest", "random"):
            raise ValueError(f"Invalid how: {how}")
        rng = self._rng_keys(p._valid.shape) if how == "random" else None
        vals, ok = dense.rowwise_selectk(p._vals, p._valid, how, int(k), rng)
        return Matrix._from_store(p.dtype, vals, ok, name=name)

    def compactify(self, how="first", ncols=None, *, name=None):
        """Pack stored values left per row (reference core/ss/matrix.py:3877)."""
        from ..engine import dense
        from ..matrix import Matrix

        p = self._parent
        if ncols is None:
            _, ok = p._host_arrays()
            width = int(ok.sum(axis=1).max()) if p.nrows else 0
        else:
            width = int(ncols)
        rng = self._rng_keys(p._valid.shape) if how == "random" else None
        vals, ok = dense.rowwise_compactify(p._vals, p._valid, how, width, rng)
        if width > p.ncols:  # pad wider than the input
            import jax.numpy as jnp

            pad = width - p.ncols
            vals = jnp.pad(vals, ((0, 0), (0, pad)))
            ok = jnp.pad(ok, ((0, 0), (0, pad)))
        return Matrix._from_store(p.dtype, vals, ok, name=name)

    def sort(self, op="<", values=True, permutation=True, *, rowwise=True,
             nthreads=None):
        """Sort values within each row (reference core/ss/matrix.py:3991;
        GxB_Matrix_sort).  Vectorized on-device composite-key sort."""
        from ..engine import dense
        from ..matrix import Matrix
        from ..operator.utils import binary_from_string

        if isinstance(op, str):
            op = binary_from_string(op)
        opname = op.name if hasattr(op, "name") else "lt"
        descending = opname in ("gt", ">")
        p = self._parent
        a_vals, a_ok = p._vals, p._valid
        if not rowwise:
            a_vals, a_ok = a_vals.T, a_ok.T
        C_vals, P_vals, out_ok = dense.rowwise_sort(a_vals, a_ok, descending)
        if not rowwise:
            C_vals, P_vals, out_ok = C_vals.T, P_vals.T, out_ok.T
        outs = []
        if values:
            outs.append(Matrix._from_store(p.dtype, C_vals, out_ok))
        if permutation:
            outs.append(Matrix._from_store(lookup_dtype(np.int64), P_vals,
                                           out_ok))
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)

    # ------------------------------------------------------------------ #
    def serialize(self, compression="default", level=None, *, nthreads=None):
        """Serialize to a bytes blob (reference core/ss/matrix.py:4057).
        Compression via zlib (lz4/zstd unavailable -> mapped to zlib levels)."""
        p = self._parent
        r, c, v = p.to_coo()
        payload = pickle.dumps(
            {
                "dtype": p.dtype.name if not p.dtype._is_udt else p.dtype.np_type.str,
                "nrows": p.nrows,
                "ncols": p.ncols,
                "rows": r,
                "cols": c,
                "values": v,
            },
            protocol=pickle.HIGHEST_PROTOCOL,
        )
        if compression in (None, "none"):
            blob = b"GBTPU0\x00" + payload
        else:
            lvl = 6 if level is None else int(level)
            blob = b"GBTPU0\x01" + zlib.compress(payload, lvl)
        return np.frombuffer(blob, dtype=np.uint8)

    @staticmethod
    def deserialize(data, dtype=None, *, nthreads=None):
        from ..matrix import Matrix

        blob = bytes(np.asarray(data, np.uint8))
        if not blob.startswith(b"GBTPU0"):
            raise InvalidValue("Invalid serialized blob")
        mode = blob[6]
        payload = blob[7:]
        if mode == 1:
            payload = zlib.decompress(payload)
        d = pickle.loads(payload)
        return Matrix.from_coo(
            d["rows"].astype(np.int64), d["cols"].astype(np.int64), d["values"],
            dtype if dtype is not None else d["dtype"],
            nrows=d["nrows"], ncols=d["ncols"],
        )

    def scan(self, op="plus", order="rowwise", *, name=None):
        """Prefix scan along rows (reference core/ss/prefix_scan.py:12-183).

        The reference implements this as log-depth semiring matmuls (Blelloch
        up/down-sweep) because it only has GraphBLAS ops; on TPU we lower to
        an XLA associative_scan over compacted elements, which is the same
        log-depth parallel scan directly."""
        import jax
        import jax.numpy as jnp

        from ..matrix import Matrix
        from ..operator.utils import get_typed_op

        p = self._parent
        typed = get_typed_op(op, p.dtype, p.dtype, kind="binary")
        rowwise = order in ("rowwise", "C", "row")
        vals, ok = p._vals, p._valid
        if not rowwise:
            vals, ok = vals.T, ok.T
        # segmented inclusive scan over stored elements within each row:
        # carry skips missing elements via identity substitution
        from ..engine import store as st

        mono = getattr(typed.parent, "monoid", None)
        if mono is not None and typed.type in mono._typed_ops:
            ident = st.identity_value_array(mono._typed_ops[typed.type], typed.type)
        else:
            ident = None
        x = st.cast_values(vals, p.dtype, typed.type)
        if ident is None:
            # general binaryop scan: use associative_scan on (value, present)
            def combine(a, b):
                av, ap = a
                bv, bp = b
                nv = jnp.where(bp & ap, typed._jax_func(av, bv),
                               jnp.where(bp, bv, av))
                return nv, ap | bp

            sv, sp = jax.lax.associative_scan(combine, (x, ok), axis=1)
        else:
            xm = jnp.where(ok, x, jnp.broadcast_to(ident, x.shape))
            sv = jax.lax.associative_scan(typed._jax_func, xm, axis=1)
            sp = ok
        out_vals = sv
        out_ok = ok
        if not rowwise:
            out_vals, out_ok = out_vals.T, out_ok.T
        res = Matrix._from_store(typed.return_type, out_vals, out_ok, name=name)
        return res


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from ..utils import x64_methods as _x64_methods  # noqa: E402
MatrixConfig = _x64_methods(MatrixConfig)
MatrixSS = _x64_methods(MatrixSS)
