"""Vector.ss: storage-format control (reference core/ss/vector.py, SURVEY row 16)."""

import pickle
import zlib

import numpy as np

from ...exceptions import InvalidValue
from ..dtypes import lookup_dtype
from ..utils import normalize_chunks


class VectorSS:
    __slots__ = "_parent", "config", "__weakref__"

    def __init__(self, parent):
        self._parent = parent
        self.config = {"format": "bitmap", "sparsity_control": "auto"}

    @property
    def format(self):
        return "bitmap"

    @property
    def nbytes(self):
        p = self._parent
        return p.size * (p.dtype.np_type.itemsize + 1)

    @property
    def is_iso(self):
        vals, ok = self._parent._host_arrays()
        pres = vals[ok]
        if len(pres) == 0:
            return False
        return bool((pres == pres.flat[0]).all())

    @property
    def iso_value(self):
        from ..scalar import Scalar

        vals, ok = self._parent._host_arrays()
        pres = vals[ok]
        if len(pres) == 0 or not (pres == pres.flat[0]).all():
            raise ValueError("Vector is not iso-valued")
        return Scalar.from_value(pres.flat[0], self._parent.dtype)

    # ------------------------------------------------------------------ #
    def export(self, format=None, *, sort=True, give_ownership=False, raw=False):
        p = self._parent
        if format is None:
            format = "sparse"
        format = format.lower()
        vals, ok = p._host_arrays()
        iso = self.is_iso
        if format == "sparse":
            idx, v = p.to_coo()
            rv = {"indices": idx, "values": v, "sorted_index": True,
                  "size": p.size, "is_iso": iso, "format": "sparse"}
        elif format == "bitmap":
            rv = {"bitmap": ok.copy(), "values": vals.copy(),
                  "nvals": int(ok.sum()), "size": p.size, "is_iso": iso,
                  "format": "bitmap"}
        elif format == "full":
            if not ok.all():
                raise InvalidValue("Vector is not full; cannot export as full")
            rv = {"values": vals.copy(), "size": p.size, "is_iso": iso,
                  "format": "full"}
        else:
            raise ValueError(f"Invalid format: {format}")
        if give_ownership:
            p.clear()
        return rv

    def unpack(self, format=None, *, sort=True, raw=False):
        """Like export(give_ownership=True): parent left valid-but-empty."""
        return self.export(format, sort=sort, give_ownership=True, raw=raw)

    @classmethod
    def import_any(cls, **kwargs):
        from ..vector import Vector

        fmt = kwargs.get("format")
        if fmt is None:
            if "indices" in kwargs:
                fmt = "sparse"
            elif "bitmap" in kwargs:
                fmt = "bitmap"
            else:
                fmt = "full"
        fmt = fmt.lower()
        dtype = kwargs.get("dtype")
        size = kwargs.get("size")
        is_iso = bool(kwargs.get("is_iso", False))

        def _values(n):
            v = np.asarray(kwargs["values"])
            if is_iso and v.size >= 1 and (v.ndim == 0 or len(v) != n):
                v = np.broadcast_to(v.reshape(-1)[:1], (n,) + v.shape[1:])
            return v

        if fmt == "sparse":
            idx = np.asarray(kwargs["indices"], np.int64)
            return Vector.from_coo(idx, _values(len(idx)), dtype, size=size)
        if fmt == "bitmap":
            import jax.numpy as jnp

            from ..engine import store as st

            bitmap = np.asarray(kwargs["bitmap"], bool)
            vals = _values(bitmap.shape[0])
            dt = lookup_dtype(dtype) if dtype is not None else lookup_dtype(vals.dtype)
            v = Vector(dt, bitmap.shape[0])
            v._set_store(st.np_values_to_device(vals.astype(dt.np_type), dt),
                         jnp.asarray(bitmap))
            return v
        if fmt == "full":
            n = size
            if n is None:
                n = len(np.asarray(kwargs["values"]).reshape(-1))
            return Vector.from_dense(np.ascontiguousarray(_values(n)), dtype=dtype)
        raise ValueError(f"Invalid format: {fmt}")

    def _make_importer(fmt):  # noqa: N805 — class-build-time helper
        def _import(cls, **kwargs):
            kwargs["format"] = fmt
            return VectorSS.import_any.__func__(cls, **kwargs)

        _import.__name__ = f"import_{fmt}"
        _import.__doc__ = f"Import a Vector from the `{fmt}` field schema (Appendix C)."
        return classmethod(_import)

    import_sparse = _make_importer("sparse")
    import_bitmap = _make_importer("bitmap")
    import_full = _make_importer("full")
    del _make_importer

    def pack_any(self, **kwargs):
        """Repopulate the parent in place from a field-schema dict."""
        p = self._parent
        kwargs.setdefault("size", p.size)
        kwargs.setdefault("dtype", p.dtype)
        v = self.import_any(**kwargs)
        p._set_store(v._vals, v._valid)
        p._size = v.size

    def _make_packer(fmt):  # noqa: N805
        def _pack(self, **kwargs):
            kwargs["format"] = fmt
            return VectorSS.pack_any(self, **kwargs)

        _pack.__name__ = f"pack_{fmt}"
        _pack.__doc__ = f"Repopulate the parent from the `{fmt}` field schema."
        return _pack

    pack_sparse = _make_packer("sparse")
    pack_bitmap = _make_packer("bitmap")
    pack_full = _make_packer("full")
    del _make_packer

    # ------------------------------------------------------------------ #
    def split(self, chunks, *, name=None):
        from ..vector import Vector

        p = self._parent
        (sizes,) = normalize_chunks(chunks, p.shape)
        tiles = []
        i0 = 0
        for s in sizes:
            tiles.append(Vector._from_store(p.dtype, p._vals[i0:i0 + s],
                                            p._valid[i0:i0 + s]))
            i0 += s
        return tiles

    def concat(self, tiles):
        """Fill the parent by concatenating a list of Vector tiles; inverse
        of split() (reference core/ss/vector.py)."""
        from ...ss import concat as _concat

        p = self._parent
        v = _concat(list(tiles), dtype=p.dtype)
        if v.size != p.size:
            raise ValueError(
                f"tiles concatenate to size {v.size}, expected {p.size}")
        p._set_store(v._vals, v._valid)

    def build_scalar(self, indices, value):
        indices = np.asarray(indices, np.int64)
        self._parent.build(indices,
                           np.broadcast_to(np.asarray(value), indices.shape))

    def iterkeys(self, seek=0):
        idx, _ = self._parent.to_coo()
        for i in range(seek, len(idx)):
            yield int(idx[i])

    def itervalues(self, seek=0):
        _, v = self._parent.to_coo()
        for i in range(seek, len(v)):
            yield v[i]

    def iteritems(self, seek=0):
        idx, v = self._parent.to_coo()
        for i in range(seek, len(idx)):
            yield (int(idx[i]), v[i])

    def head(self, n=10, dtype=None, *, sort=False):
        idx, v = self._parent.to_coo(dtype)
        return idx[:n], v[:n]

    # ------------------------------------------------------------------ #
    @staticmethod
    def _rng_keys(shape):
        import jax.numpy as jnp

        return jnp.asarray(
            np.random.default_rng().random(shape, dtype=np.float32))

    def selectk(self, how, k, *, name=None):
        """Reference core/ss/vector.py:1407.  Vectorized on-device kernel
        (engine/dense.py rowwise_selectk on the 1-D store)."""
        from ..engine import dense
        from ..vector import Vector

        p = self._parent
        if how not in ("first", "last", "smallest", "largest", "random"):
            raise ValueError(f"Invalid how: {how}")
        rng = self._rng_keys(p._valid.shape) if how == "random" else None
        vals, ok = dense.rowwise_selectk(p._vals, p._valid, how, int(k), rng)
        return Vector._from_store(p.dtype, vals, ok, name=name)

    def compactify(self, how="first", size=None, *, name=None):
        """Reference core/ss/vector.py:1456."""
        from ..engine import dense
        from ..vector import Vector

        p = self._parent
        if size is None:
            _, ok = p._host_arrays()
            width = int(ok.sum())
        else:
            width = int(size)
        rng = self._rng_keys(p._valid.shape) if how == "random" else None
        vals, ok = dense.rowwise_compactify(p._vals, p._valid, how, width, rng)
        if width > p.size:
            import jax.numpy as jnp

            pad = width - p.size
            vals = jnp.pad(vals, (0, pad))
            ok = jnp.pad(ok, (0, pad))
        return Vector._from_store(p.dtype, vals, ok, name=name)

    def sort(self, op="<", values=True, permutation=True, *, nthreads=None):
        """Reference core/ss/vector.py:1562 (GxB_Vector_sort)."""
        from ..engine import dense
        from ..operator.utils import binary_from_string
        from ..vector import Vector

        if isinstance(op, str):
            op = binary_from_string(op)
        opname = op.name if hasattr(op, "name") else "lt"
        descending = opname in ("gt", ">")
        p = self._parent
        C_vals, P_vals, out_ok = dense.rowwise_sort(p._vals, p._valid,
                                                    descending)
        outs = []
        if values:
            outs.append(Vector._from_store(p.dtype, C_vals, out_ok))
        if permutation:
            outs.append(Vector._from_store(lookup_dtype(np.int64), P_vals,
                                           out_ok))
        if len(outs) == 1:
            return outs[0]
        return tuple(outs)

    def serialize(self, compression="default", level=None, *, nthreads=None):
        p = self._parent
        idx, v = p.to_coo()
        payload = pickle.dumps(
            {"dtype": p.dtype.name if not p.dtype._is_udt else p.dtype.np_type.str,
             "size": p.size, "indices": idx, "values": v},
            protocol=pickle.HIGHEST_PROTOCOL)
        if compression in (None, "none"):
            blob = b"GBTPU1\x00" + payload
        else:
            lvl = 6 if level is None else int(level)
            blob = b"GBTPU1\x01" + zlib.compress(payload, lvl)
        return np.frombuffer(blob, dtype=np.uint8)

    @staticmethod
    def deserialize(data, dtype=None, *, nthreads=None):
        from ..vector import Vector

        blob = bytes(np.asarray(data, np.uint8))
        if not blob.startswith(b"GBTPU1"):
            raise InvalidValue("Invalid serialized blob")
        mode = blob[6]
        payload = blob[7:]
        if mode == 1:
            payload = zlib.decompress(payload)
        d = pickle.loads(payload)
        return Vector.from_coo(d["indices"].astype(np.int64), d["values"],
                               dtype if dtype is not None else d["dtype"],
                               size=d["size"])

    def scan(self, op="plus", *, name=None):
        """Prefix scan (reference core/ss/prefix_scan.py applied to vectors)."""
        m = self._parent._as_matrix()
        from ..matrix import Matrix

        mm = Matrix._from_store(self._parent.dtype, m._vals.T, m._valid.T)
        res = mm.ss.scan(op, order="rowwise", name=name)
        from ..vector import Vector

        return Vector._from_store(res.dtype, res._vals[0], res._valid[0], name=name)


def random_choice(n, k):
    """k distinct indices chosen uniformly from range(n)
    (reference core/ss/vector.py:1725, numba)."""
    n, k = int(n), int(k)
    if k >= n:
        return np.arange(n, dtype=np.uint64)
    return np.random.default_rng().choice(n, size=k, replace=False).astype(
        np.uint64)


# scoped 64-bit mode over the whole API surface (core/utils.py:x64_methods)
from ..utils import x64_methods as _x64_methods  # noqa: E402
VectorSS = _x64_methods(VectorSS)
