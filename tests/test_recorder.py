import pytest

import graphblas_tpu as gb
from graphblas_tpu import Recorder, binary, monoid, semiring

from .helpers import make_A, make_v


def test_recorder_records_dispatches():
    A = make_A()
    v = make_v()
    with Recorder() as rec:
        w = v.vxm(A, semiring.min_plus).new()
    assert rec.is_recording is False
    assert len(rec) >= 1
    line = rec.data[0]
    assert "vxm" in line
    assert "min_plus" in line


def test_recorder_stop_start():
    v = make_v()
    rec = Recorder(start=False)
    assert not rec.is_recording
    v.reduce(monoid.plus).new()
    assert len(rec) == 0
    rec.start()
    v.reduce(monoid.plus).new()
    rec.stop()
    assert len(rec) >= 1
    n = len(rec)
    v.reduce(monoid.plus).new()
    assert len(rec) == n
    rec.clear()
    assert len(rec) == 0


def test_recorder_masked_update():
    v = make_v()
    out = gb.Vector(gb.dtypes.INT64, 7)
    with Recorder() as rec:
        out(v.S, accum=binary.plus) << v.apply(binary.plus, right=1)
    text = "\n".join(rec.data)
    assert "apply" in text
    assert "accum=plus" in text
    assert "mask=" in text


def test_recorder_repr():
    with Recorder() as rec:
        make_v().reduce(monoid.plus).new()
    r = repr(rec)
    assert "Recorder" in r
    assert "_repr_markdown_" in dir(rec)


def test_recorder_exact_lines():
    # the recorded text is a stable, diffable contract
    # (reference tests/test_recorder.py pins exact C-call text)
    A = make_A()
    A.name = "A"
    v = make_v()
    v.name = "v"
    w = gb.Vector(gb.dtypes.INT64, 7, name="w")
    with Recorder() as rec:
        w(v.S) << v.vxm(A, semiring.plus_times)
    assert any(
        "vxm(w, mask=v.S" in line and "plus_times" in line
        for line in rec.data
    ), rec.data


def test_recorder_context_isolation():
    # a nested recorder captures independently
    v = make_v()
    with Recorder() as outer:
        v.reduce(monoid.plus).new()
        with Recorder() as inner:
            v.reduce(monoid.max).new()
        v.reduce(monoid.min).new()
    assert any("max" in ln for ln in inner.data)
    assert not any("plus" in ln for ln in inner.data)
    assert any("plus" in ln for ln in outer.data)
    assert any("min" in ln for ln in outer.data)


def test_recorder_assign_and_extract_lines():
    A = make_A()
    with Recorder() as rec:
        A[0, 1].new()
        A[0, :] = gb.Vector.from_coo([0], [9], size=7)
    joined = "\n".join(rec.data)
    assert "extract" in joined or "assign" in joined
