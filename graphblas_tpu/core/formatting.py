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


def _grid(host_vals, host_ok, dtype, nrows, ncols, is_vector=False):
    show_r = min(nrows, _MAX_ROWS)
    show_c = min(ncols, _MAX_COLS)
    trunc_r = nrows > show_r
    trunc_c = ncols > show_c
    cells = []
    header = [""] + [str(j) for j in range(show_c)] + (["..."] if trunc_c else [])
    cells.append(header)
    for i in range(show_r):
        row = [str(i)]
        for j in range(show_c):
            if is_vector:
                ok = host_ok[j] if i == 0 else False
                v = host_vals[j] if ok else None
            else:
                ok = host_ok[i, j]
                v = host_vals[i, j] if ok else None
            row.append(_fmt_val(v, dtype) if ok else "")
        if trunc_c:
            row.append("...")
        cells.append(row)
    if trunc_r:
        cells.append(["..."] * len(cells[0]))
    widths = [max(len(r[k]) for r in cells) for k in range(len(cells[0]))]
    lines = []
    for r in cells:
        lines.append("  ".join(val.rjust(w) for val, w in zip(r, widths)))
    return "\n".join(lines)


def format_vector(v):
    name = f'"{v.name}"' if v.name else "gb.Vector"
    header = (f"{name}       nvals  size  dtype   format\n"
              f"vector  {v.nvals:>6} {v.size:>5}  {v.dtype.name:<6}  bitmap")
    if v.size == 0:
        return header
    host_vals, host_ok = v._host_arrays()
    if v.dtype._is_udt:
        return header
    grid = _grid(host_vals, host_ok, v.dtype, 1, v.size, is_vector=True)
    return f"{header}\n{'-' * 40}\n{grid}"


def format_matrix(m):
    name = f'"{m.name}"' if m.name else "gb.Matrix"
    header = (f"{name}       nvals  nrows  ncols  dtype   format\n"
              f"matrix  {m.nvals:>6} {m.nrows:>6} {m.ncols:>6}  {m.dtype.name:<6}  bitmap")
    if m.nrows == 0 or m.ncols == 0:
        return header
    if m.dtype._is_udt:
        return header
    host_vals, host_ok = m._host_arrays()
    grid = _grid(host_vals, host_ok, m.dtype, m.nrows, m.ncols)
    return f"{header}\n{'-' * 40}\n{grid}"


def _html_grid(host_vals, host_ok, dtype, nrows, ncols, is_vector=False):
    show_r = min(nrows, _MAX_ROWS)
    show_c = min(ncols, _MAX_COLS)
    rows_html = []
    head = "".join(f"<th>{j}</th>" for j in range(show_c))
    if ncols > show_c:
        head += "<th>...</th>"
    rows_html.append(f"<tr><th></th>{head}</tr>")
    for i in range(show_r):
        cells = []
        for j in range(show_c):
            if is_vector:
                ok = host_ok[j] if i == 0 else False
                val = host_vals[j] if ok else None
            else:
                ok = host_ok[i, j]
                val = host_vals[i, j] if ok else None
            cells.append(f"<td>{_fmt_val(val, dtype) if ok else ''}</td>")
        if ncols > show_c:
            cells.append("<td>...</td>")
        rows_html.append(f"<tr><th>{i}</th>{''.join(cells)}</tr>")
    if nrows > show_r:
        rows_html.append("<tr><th>...</th></tr>")
    return "<table>" + "".join(rows_html) + "</table>"


def format_matrix_html(m, mask=None):
    name = m.name or "gb.Matrix"
    header = (f"<b>{name}</b> — nvals={m.nvals}, nrows={m.nrows}, "
              f"ncols={m.ncols}, dtype={m.dtype.name}, format=bitmap")
    if m.nrows == 0 or m.ncols == 0 or m.dtype._is_udt:
        return f"<div>{header}</div>"
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
