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
