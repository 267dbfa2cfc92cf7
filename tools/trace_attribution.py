#!/usr/bin/env python
"""Per-op attribution of a jax.profiler trace (VERDICT r2 item 3).

Parses the Chrome-trace JSON that `bench.py --trace DIR` writes
(DIR/plugins/profile/*/vm.trace.json.gz) and attributes DEVICE time to
HLO ops: category totals, the top ops with shapes, achieved HBM
bandwidth and FLOP/s. Works on leaf device events only (container spans
like `jit_train_step` / `while.N` nest their children, so summing
everything would double-count).

Usage:
  python tools/trace_attribution.py docs/trace_r3 [--steps 4] [--json OUT]

`--steps` = how many train steps the traced window dispatched (bench.py
traces 4); per-step numbers divide by it.
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

# v5e (TPU v5 lite) public specs: HBM2 bandwidth, bf16 MXU peak
HBM_PEAK_GBS = 819.0
MXU_PEAK_FLOPS = 197e12


def load_trace(trace_dir: str) -> list[dict]:
    pats = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not pats:
        sys.exit(f"no *.trace.json.gz under {trace_dir}")
    with gzip.open(pats[-1]) as f:
        return json.load(f)["traceEvents"]


def device_pid(events: list[dict]) -> int:
    for e in events:
        if (e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))):
            return e["pid"]
    sys.exit("no TPU device track in trace")


def leaf_events(events: list[dict], pid: int) -> list[dict]:
    """Device-track complete events that contain no other event.

    The device track is a proper nesting (container spans like
    jit_train_step / while.N wrap their children), so a sweep over
    start-sorted intervals finds leaves in O(n log n)."""
    xs = [e for e in events
          if e.get("ph") == "X" and e.get("pid") == pid
          and e.get("dur", 0) > 0]
    xs.sort(key=lambda e: (e["ts"], -e["dur"]))
    leaves = []
    stack: list[dict] = []
    for e in xs:
        while stack and stack[-1]["ts"] + stack[-1]["dur"] <= e["ts"]:
            top = stack.pop()
            if top.get("_leaf", True):
                leaves.append(top)
        if stack:
            stack[-1]["_leaf"] = False
        stack.append(e)
    while stack:
        top = stack.pop()
        if top.get("_leaf", True):
            leaves.append(top)
    return leaves


_SHAPE = re.compile(r"= (\S+?)\{")


def op_shape(e: dict) -> str:
    ln = e.get("args", {}).get("long_name", "")
    m = _SHAPE.search(ln)
    return m.group(1) if m else ""


def attribute(events: list[dict], steps: int) -> dict:
    pid = device_pid(events)
    leaves = leaf_events(events, pid)
    total_us = sum(e["dur"] for e in leaves)

    by_cat = collections.Counter()
    by_op = collections.Counter()
    op_meta: dict[str, dict] = {}
    bytes_total = 0
    flops_total = 0
    for e in leaves:
        a = e.get("args", {})
        cat = a.get("hlo_category", "(uncategorised)")
        by_cat[cat] += e["dur"]
        # dedup repeated instances of the same op across steps/frames
        key = f"{e['name']} {op_shape(e)}"
        by_op[key] += e["dur"]
        m = op_meta.setdefault(key, {"count": 0, "cat": cat,
                                     "bytes": 0, "flops": 0})
        m["count"] += 1
        m["bytes"] += int(a.get("bytes_accessed", 0) or 0)
        m["flops"] += int(a.get("model_flops", 0) or 0)
        bytes_total += int(a.get("bytes_accessed", 0) or 0)
        flops_total += int(a.get("model_flops", 0) or 0)

    total_s = total_us / 1e6
    out = {
        "device_busy_ms_total": round(total_us / 1e3, 3),
        "device_busy_ms_per_step": round(total_us / 1e3 / steps, 3),
        "steps": steps,
        "achieved_hbm_gbs": round(bytes_total / total_s / 1e9, 1),
        "hbm_utilisation": round(bytes_total / total_s / 1e9
                                 / HBM_PEAK_GBS, 3),
        "achieved_tflops": round(flops_total / total_s / 1e12, 3),
        "mxu_utilisation": round(flops_total / total_s / MXU_PEAK_FLOPS, 4),
        "by_category_ms": {k: round(v / 1e3, 3)
                           for k, v in by_cat.most_common()},
        "top_ops": [
            {
                "op": k,
                "ms_total": round(v / 1e3, 3),
                "pct": round(100 * v / total_us, 1),
                "count": op_meta[k]["count"],
                "category": op_meta[k]["cat"],
                "gbs": round(op_meta[k]["bytes"] / (v / 1e6) / 1e9, 1)
                       if v else 0.0,
            }
            for k, v in by_op.most_common(20)
        ],
    }
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("trace_dir")
    ap.add_argument("--steps", type=int, default=4)
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    res = attribute(load_trace(args.trace_dir), args.steps)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(res, f, indent=2)
        print(f"wrote {args.json}")
    print(json.dumps({k: v for k, v in res.items() if k != "top_ops"},
                     indent=2))
    print(f"\n{'ms':>9} {'%':>5} {'x':>5} {'GB/s':>7}  op")
    for o in res["top_ops"]:
        print(f"{o['ms_total']:9.2f} {o['pct']:5.1f} {o['count']:5d} "
              f"{o['gbs']:7.1f}  [{o['category']}] {o['op'][:80]}")


if __name__ == "__main__":
    main()
