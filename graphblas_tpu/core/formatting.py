"""Rich reprs (reference core/formatting.py — pandas-backed grids).

We render small collections as aligned text grids (no pandas dependency);
large collections show a summary header plus corner entries, mirroring the
reference's layout: name, nvals, size/shape, dtype, format.
"""

import numpy as np

_MAX_ROWS = 12
_MAX_COLS = 14


def _fmt_val(v, dtype):
    if dtype.is_float:
        return f"{v:.6g}"
    if dtype.is_complex:
        return f"{v:.4g}"
    if dtype.is_bool:
        return "True" if v else "False"
    return str(v)


def format_scalar(s):
    header = (
        f'"{s.name}"' if s.name else "gb.Scalar"
    )
    val = s.value
    vs = "" if val is None else _fmt_val(val, s.dtype)
    return (
        f"{header}\n"
        f"value: {vs if val is not None else '(empty)'}\n"
        f"dtype: {s.dtype.name}"
    )


def _window(n, maxn):
    """Index window with two-sided truncation (pandas-style: head entries,
    an ellipsis, tail entries — the reference's truncated-grid layout,
    test_formatting.py large-matrix goldens).  None marks the ellipsis."""
    if n <= maxn:
        return list(range(n))
    half = maxn // 2
    return list(range(half)) + [None] + list(range(n - half, n))


def _grid(host_vals, host_ok, dtype, nrows, ncols, is_vector=False):
    rows_w = [0] if is_vector else _window(nrows, _MAX_ROWS)
    cols_w = _window(ncols, _MAX_COLS)
    cells = []
    cells.append([""] + ["..." if j is None else str(j) for j in cols_w])
    for i in rows_w:
        if i is None:
            cells.append(["..."] * len(cells[0]))
            continue
        row = [str(i)]
        for j in cols_w:
            if j is None:
                row.append("...")
                continue
            if is_vector:
                ok = host_ok[j]
                v = host_vals[j] if ok else None
            else:
                ok = host_ok[i, j]
                v = host_vals[i, j] if ok else None
            row.append(_fmt_val(v, dtype) if ok else "")
        cells.append(row)
    widths = [max(len(r[k]) for r in cells) for k in range(len(cells[0]))]
    lines = []
    for r in cells:
        lines.append("  ".join(val.rjust(w) for val, w in zip(r, widths)))
    return "\n".join(lines)


def _header(name, type_lines, cols):
    """Reference-style aligned header (reference test_formatting.py goldens):

        "A_1"      nvals  nrows  ncols  dtype   format
        gb.Matrix      3      1      5  INT64  bitmapr

    type_lines: one or more left-column lines (masks use two); values on the
    last one.  cols: [(label, value_str), ...].
    """
    left = max(len(name), *(len(t) for t in type_lines))
    widths = [max(len(lbl), len(val)) for lbl, val in cols]
    line1 = name.ljust(left) + "".join(
        "  " + lbl.rjust(w) for (lbl, _), w in zip(cols, widths))
    out = [line1]
    for t in type_lines[:-1]:
        out.append(t)
    out.append(type_lines[-1].ljust(left) + "".join(
        "  " + val.rjust(w) for (_, val), w in zip(cols, widths)))
    return "\n".join(out), len(line1)


def _with_grid(header, width, obj, host_vals, host_ok, is_vector):
    if obj.dtype._is_udt:
        return header
    nrows, ncols = (1, obj.size) if is_vector else (obj.nrows, obj.ncols)
    if nrows == 0 or ncols == 0:
        return header
    grid = _grid(host_vals, host_ok, obj.dtype, nrows, ncols,
                 is_vector=is_vector)
    return f"{header}\n{'-' * width}\n{grid}"


def format_vector(v, type_name="gb.Vector"):
    name = f'"{v.name}"' if v.name else type_name
    header, w = _header(
        name, [type_name],
        [("nvals", str(v.nvals)), ("size", str(v.size)),
         ("dtype", v.dtype.name), ("format", v.ss.format)])
    if v.size == 0 or v.dtype._is_udt:
        return header
    host_vals, host_ok = v._host_arrays()
    return _with_grid(header, w, v, host_vals, host_ok, True)


def _sparse_summary(header, sp, max_entries=10):
    """Repr body for graph-scale sparse matrices: a truncated COO listing
    instead of densifying into a grid (which the dense_limit guard forbids)."""
    import numpy as np

    k = min(max_entries, sp.cap)
    ok = np.asarray(sp.ok[:k])
    r = np.asarray(sp.rowids[:k])[ok]
    c = np.asarray(sp.cols[:k])[ok]
    if isinstance(sp.vals, dict):
        vals = ["{...}"] * len(r)
    else:
        vals = [str(x.item() if hasattr(x, "item") else x)
                for x in np.asarray(sp.vals[:k])[ok]]
    lines = [f"  ({i}, {j})\t{v}" for i, j, v in zip(r, c, vals)]
    if len(lines) == max_entries:
        lines.append("  ...")
    return header + "\n" + "\n".join(lines)


def format_matrix(m, type_name="gb.Matrix"):
    name = f'"{m.name}"' if m.name else type_name
    header, w = _header(
        name, [type_name],
        [("nvals", str(m.nvals)), ("nrows", str(m.nrows)),
         ("ncols", str(m.ncols)), ("dtype", m.dtype.name),
         ("format", m.ss.format)])
    if m.nrows == 0 or m.ncols == 0 or m.dtype._is_udt:
        return header
    if m._sparse is not None:
        from .config import config

        if m.nrows * m.ncols > int(config.get("dense_limit", 1 << 26)):
            return _sparse_summary(header, m._sparse)
    host_vals, host_ok = m._host_arrays()
    return _with_grid(header, w, m, host_vals, host_ok, False)


def format_transposed(t):
    """TransposedMatrix repr: the transposed grid under a gb.TransposedMatrix
    header (reference test_formatting.py:150-152, 196-204)."""
    m = t._matrix
    name = f'"{m.name}.T"' if m.name else "gb.TransposedMatrix"
    header, w = _header(
        name, ["gb.TransposedMatrix"],
        [("nvals", str(m.nvals)), ("nrows", str(t.nrows)),
         ("ncols", str(t.ncols)), ("dtype", m.dtype.name),
         ("format", "bitmapc")])
    if t.nrows == 0 or t.ncols == 0 or m.dtype._is_udt:
        return header
    if m._sparse is not None:
        from .config import config

        if m.nrows * m.ncols > int(config.get("dense_limit", 1 << 26)):
            return _sparse_summary(header, m._sparse)
    host_vals, host_ok = m._host_arrays()

    class _Shim:
        pass

    shim = _Shim()
    shim.dtype = m.dtype
    shim.nrows, shim.ncols = t.nrows, t.ncols
    return _with_grid(header, w, shim, np.asarray(host_vals).T,
                      np.asarray(host_ok).T, False)


_MASK_CLASS = {
    (False, True): "StructuralMask",
    (False, False): "ValueMask",
    (True, True): "ComplementedStructuralMask",
    (True, False): "ComplementedValueMask",
}


def format_mask(mask):
    """Mask repr: 0/1 grid at the parent's stored positions
    (reference test_formatting.py:205-260)."""
    parent = mask.parent
    is_vector = parent.ndim == 1
    prefix = "~" if mask.complement else ""
    suffix = "S" if mask.structure else "V"
    pname = parent.name or ("v" if is_vector else "M")
    name = f'"{prefix}{pname}.{suffix}"'
    mask_cls = _MASK_CLASS[(mask.complement, mask.structure)]
    type_label = f"of gb.{'Vector' if is_vector else 'Matrix'}"
    if is_vector:
        cols = [("nvals", str(parent.nvals)), ("size", str(parent.size)),
                ("dtype", parent.dtype.name), ("format", parent.ss.format)]
    else:
        cols = [("nvals", str(parent.nvals)), ("nrows", str(parent.nrows)),
                ("ncols", str(parent.ncols)), ("dtype", parent.dtype.name),
                ("format", parent.ss.format)]
    header, w = _header(name, [mask_cls, type_label], cols)
    if parent.dtype._is_udt:
        return header
    host_vals, host_ok = parent._host_arrays()
    # mask grid: show, at each STORED position, whether the mask passes there
    if mask.structure:
        shown = np.ones_like(host_ok, dtype=np.int64)
    else:
        shown = (np.asarray(host_vals) != 0).astype(np.int64)
    if mask.complement:
        shown = 1 - shown
    from .dtypes import lookup_dtype

    int_dt = lookup_dtype(np.int64)

    class _Shim:
        pass

    shim = _Shim()
    shim.dtype = int_dt
    shim.size = getattr(parent, "size", None)
    shim.nrows = getattr(parent, "nrows", None)
    shim.ncols = getattr(parent, "ncols", None)
    return _with_grid(header, w, shim, shown, host_ok, is_vector)


def _html_grid(host_vals, host_ok, dtype, nrows, ncols, is_vector=False):
    rows_w = [0] if is_vector else _window(nrows, _MAX_ROWS)
    cols_w = _window(ncols, _MAX_COLS)
    rows_html = []
    head = "".join("<th>...</th>" if j is None else f"<th>{j}</th>"
                   for j in cols_w)
    rows_html.append(f"<tr><th></th>{head}</tr>")
    for i in rows_w:
        if i is None:
            rows_html.append(
                "<tr><th>...</th>" + "<td>...</td>" * len(cols_w) + "</tr>")
            continue
        cells = []
        for j in cols_w:
            if j is None:
                cells.append("<td>...</td>")
                continue
            if is_vector:
                ok = host_ok[j]
                val = host_vals[j] if ok else None
            else:
                ok = host_ok[i, j]
                val = host_vals[i, j] if ok else None
            cells.append(f"<td>{_fmt_val(val, dtype) if ok else ''}</td>")
        rows_html.append(f"<tr><th>{i}</th>{''.join(cells)}</tr>")
    return "<table>" + "".join(rows_html) + "</table>"


def format_matrix_html(m, mask=None):
    name = m.name or "gb.Matrix"
    header = (f"<b>{name}</b> — nvals={m.nvals}, nrows={m.nrows}, "
              f"ncols={m.ncols}, dtype={m.dtype.name}, format=bitmap")
    if m.nrows == 0 or m.ncols == 0 or m.dtype._is_udt:
        return f"<div>{header}</div>"
    if m._sparse is not None:
        from .config import config

        if m.nrows * m.ncols > int(config.get("dense_limit", 1 << 26)):
            body = _sparse_summary("", m._sparse).replace("\n", "<br>")
            return f"<div>{header}<pre>{body}</pre></div>"
    host_vals, host_ok = m._host_arrays()
    return f"<div>{header}{_html_grid(host_vals, host_ok, m.dtype, m.nrows, m.ncols)}</div>"


def format_vector_html(v, mask=None):
    name = v.name or "gb.Vector"
    header = f"<b>{name}</b> — nvals={v.nvals}, size={v.size}, dtype={v.dtype.name}"
    if v.size == 0 or v.dtype._is_udt:
        return f"<div>{header}</div>"
    host_vals, host_ok = v._host_arrays()
    return (f"<div>{header}"
            f"{_html_grid(host_vals, host_ok, v.dtype, 1, v.size, is_vector=True)}</div>")


def format_scalar_html(s):
    val = s.value
    vs = _fmt_val(val, s.dtype) if val is not None else "(empty)"
    return (f"<div><b>{s.name or 'gb.Scalar'}</b> — value={vs}, "
            f"dtype={s.dtype.name}</div>")


def format_expression(expr):
    opname = getattr(expr.op, "name", None)
    arg_names = []
    for a in expr.args:
        n = getattr(a, "name", None)
        arg_names.append(n if n else type(a).__name__)
    inner = ", ".join(arg_names)
    op_part = f", op={opname}" if opname else ""
    cls = expr.output_type.__name__ if expr.output_type else "Expression"
    return (f"gb.{cls}Expression  {expr.method_name}({inner}{op_part})  "
            f"dtype={expr.dtype.name if hasattr(expr.dtype, 'name') else expr.dtype}  "
            f"shape={expr._shape}\n"
            "Do expr.new() or `output << expr` to calculate the expression.")
