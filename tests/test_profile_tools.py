"""Tests for scripts/profile_top_ops.py — the BENCH.md evidence tool.

Builds a synthetic trace-viewer JSON (the exact structure the jax profiler
exports: process/thread metadata 'M' events plus 'X' duration events with
``tf_op``/``long_name`` args) and checks all three rollup modes attribute
device time the way the BENCH.md tables assume.
"""

import gzip
import importlib.util
import json
import os.path as osp
import sys

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "profile_top_ops",
    osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
             "scripts", "profile_top_ops.py"),
)
ptop = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(ptop)


def _meta(pid, name):
    return {"ph": "M", "pid": pid, "name": "process_name", "args": {"name": name}}


def _tmeta(pid, tid, name):
    return {"ph": "M", "pid": pid, "tid": tid, "name": "thread_name",
            "args": {"name": name}}


def _x(pid, tid, name, dur_us, tf_op="", long_name=""):
    ev = {"ph": "X", "pid": pid, "tid": tid, "name": name, "dur": dur_us,
          "ts": 0, "args": {}}
    if tf_op:
        ev["args"]["tf_op"] = tf_op
    if long_name:
        ev["args"]["long_name"] = long_name
    return ev


@pytest.fixture
def trace_dir(tmp_path):
    events = [
        _meta(1, "/device:TPU:0"),
        _meta(2, "Host threads"),
        _tmeta(1, 10, "XLA Ops"),
        _tmeta(1, 11, "Steps"),
        _tmeta(2, 20, "python threads"),
        # device XLA-op events (tid 10): a fusion, a gather, a copy
        _x(1, 10, "fusion.1", 2000,
           tf_op="jit(step)/jvp(DynamoModel)/DynamoModel.predict_depths/depth_enc/stem1_1"),
        _x(1, 10, "gather.7", 1000,
           tf_op="jit(step)/jvp(DynamoModel)/gather"),
        _x(1, 10, "copy.3", 500,
           tf_op="jit(step)/transpose(jvp(DynamoModel))/DynamoModel.predict_motions/motion_dec/refine",
           long_name="%copy.3 = f32[3,3,9,9]{3,2,1,0:T(8,128)} copy(...)"),
        # same names on the step-rollup thread must NOT be double counted
        _x(1, 11, "fusion.1", 99999),
        # host events must be ignored entirely
        _x(2, 20, "fusion.1", 77777),
    ]
    d = tmp_path / "prof"
    run = d / "plugins" / "profile" / "run1"
    run.mkdir(parents=True)
    with gzip.open(run / "host.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)
    return str(d)


def _run_main(trace_dir, capsys, *flags):
    argv = ["profile_top_ops.py", trace_dir, "25", *flags]
    old = sys.argv
    sys.argv = argv
    try:
        ptop.main()
    finally:
        sys.argv = old
    return capsys.readouterr().out


def test_top_ops_and_category_rollup(trace_dir, capsys):
    out = _run_main(trace_dir, capsys)
    # 2000+1000+500 us = 3.5 ms total; host + step-thread events excluded
    assert "total device op time: 3.50 ms" in out
    assert "fusion.1" in out and "gather.7" in out
    # category rollup classifies by op name
    assert "fusion" in out and "gather" in out and "layout/copy" in out
    assert "77777" not in out and "99999" not in out


def test_by_module_rollup_separates_fwd_bwd(trace_dir, capsys):
    out = _run_main(trace_dir, capsys, "--by-module")
    assert "fwd predict_depths/depth_enc/stem1_1" in out
    assert "bwd predict_motions/motion_dec/refine" in out


def test_copies_rollup_shows_layouts(trace_dir, capsys):
    out = _run_main(trace_dir, capsys, "--copies")
    # only the copy event (0.5 ms), with its HLO layout line
    assert "total explicit copy/transpose: 0.50 ms" in out
    assert "T(8,128)" in out
    assert "fusion.1" not in out


def test_classify():
    assert ptop.classify("fusion.12") == "fusion"
    assert ptop.classify("dynamic-update-slice") == "other"
    assert ptop.classify("copy_add_fusion.3") == "fusion"
    assert ptop.classify("transpose.9") == "layout/copy"
    assert ptop.classify("all-reduce.1") == "collective"
