"""tools/trace_attribution.py: leaf-only device-time attribution.

The tool backs docs/mfu_attribution.md; this pins its core invariant —
container spans (jit_train_step, while.N) must NOT double-count into the
category totals, and bytes/flops aggregate per leaf op."""

import gzip
import json
import os

import pytest

from tools.trace_attribution import attribute, load_trace


def _ev(name, ts, dur, pid=3, cat="loop fusion", bytes_=0, flops=0,
        long_name=""):
    return {"ph": "X", "pid": pid, "tid": 1, "name": name, "ts": ts,
            "dur": dur,
            "args": {"hlo_category": cat, "bytes_accessed": str(bytes_),
                     "model_flops": str(flops), "long_name": long_name}}


def _trace():
    return [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 701, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        # container span wrapping two leaves — must not be counted
        _ev("jit_train_step", 0, 100, cat="(container)"),
        _ev("fusion.1", 0, 60, cat="convolution fusion",
            bytes_=6_000, flops=12_000,
            long_name="%fusion.1 = f32[2,4]{1,0} fusion(...)"),
        _ev("fusion.2", 60, 30, cat="loop fusion", bytes_=3_000),
        # leaf outside the container
        _ev("copy.9", 200, 10, cat="data formatting", bytes_=1_000),
        # host-side event — wrong pid, ignored entirely
        _ev("host_thing", 0, 500, pid=701),
    ]


def test_leaf_attribution(tmp_path):
    res = attribute(_trace(), steps=2)
    # container excluded: 60 + 30 + 10 = 100 us
    assert res["device_busy_ms_total"] == pytest.approx(0.1)
    assert res["device_busy_ms_per_step"] == pytest.approx(0.05)
    assert res["by_category_ms"] == {
        "convolution fusion": pytest.approx(0.06),
        "loop fusion": pytest.approx(0.03),
        "data formatting": pytest.approx(0.01),
    }
    # access bytes: 10_000 B over 100 us = 0.1 GB/s (per-access upper bound)
    assert res["access_gbs"] == pytest.approx(0.1)
    # HBM headline: fusion.1's HLO text parses to a 32-byte f32[2,4] result
    # with no operands -> min(6000, 32) = 32; the other two events carry no
    # HLO text and fall back to their access bytes (3000 + 1000)
    assert res["achieved_hbm_gbs"] == round(4032 / 100e-6 / 1e9, 2)
    assert res["hbm_utilisation"] <= 1.0
    top = res["top_ops"][0]
    assert top["op"].startswith("fusion.1")
    assert "f32[2,4]" in top["op"]
    assert top["pct"] == pytest.approx(60.0)


def test_hbm_bytes_unique_buffer_model():
    """The residency-aware per-execution traffic model (VERDICT r3 weak 1):
    S(n>0) buffers are VMEM-resident (no HBM bytes), repeated operands
    move once, tuple outputs all count, unparseable text -> None."""
    from tools.trace_attribution import hbm_bytes_one_exec as f
    # 2x4 f32 out (32 B) + two distinct operands (32 + 16 B)
    ln = ("%fusion.1 = f32[2,4]{1,0:T(8,128)} fusion("
          "f32[2,4]{1,0:T(8,128)} %a, f32[4]{0:T(128)} %b)")
    assert f(ln) == 32 + 32 + 16
    # same operand twice moves once
    ln = ("%add.1 = f32[2,4]{1,0} add("
          "f32[2,4]{1,0} %a, f32[2,4]{1,0} %a)")
    assert f(ln) == 32 + 32
    # VMEM-resident (S(1)) output and operand contribute nothing
    ln = ("%fusion.2 = f32[2,4]{1,0:T(8,128)S(1)} fusion("
          "f32[2,4]{1,0:S(1)} %a, bf16[4]{0:T(128)} %b)")
    assert f(ln) == 8
    # tuple output: both results count
    ln = ("%fusion.3 = (f32[2]{0}, bf16[2]{0}) fusion("
          "f32[2]{0} %x)")
    assert f(ln) == 8 + 4 + 8
    # scalar shapes ([] = 1 element) and no-operand ops
    assert f("%iota.1 = s32[5]{0} iota()") == 20
    assert f("not hlo text") is None


def test_load_trace_roundtrip(tmp_path):
    d = tmp_path / "plugins" / "profile" / "2026_01_01"
    os.makedirs(d)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": _trace()}, f)
    res = attribute(load_trace(str(tmp_path)), steps=1)
    assert res["device_busy_ms_total"] == pytest.approx(0.1)
