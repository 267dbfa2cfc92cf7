#!/usr/bin/env python
"""Archive a full-protocol run's metric artifacts into docs/.

Copies the judge-checkable JSONs (eval metrics for both test pools, the
runner's own test pass, settings) plus a compact history summary —
mirroring the docs/protocol_r2/<label>/ layout — so full-scale results
survive even though runs_protocol*/ is gitignored.

Usage:
  python tools/archive_protocol_run.py RUN_DIR LABEL [--dest docs/protocol_r3]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("run_dir")
    ap.add_argument("label")
    ap.add_argument("--dest", default="docs/protocol_r3")
    args = ap.parse_args()

    out = os.path.join(args.dest, args.label)
    os.makedirs(out, exist_ok=True)

    for rel in ("evaluate_biear_metrics_test1.json",
                "evaluate_biear_metrics_test2.json",
                os.path.join("logs_json", "test_metrics.json"),
                os.path.join("meta", "settings.json")):
        src = os.path.join(args.run_dir, rel)
        if os.path.exists(src):
            shutil.copy(src, os.path.join(out, os.path.basename(rel)))
        else:
            print(f"[archive] missing (skipped): {src}")

    hist_path = os.path.join(args.run_dir, "logs_json", "history.json")
    if os.path.exists(hist_path):
        with open(hist_path) as f:
            hist = json.load(f)
        val = hist.get("val", [])
        if val:
            with open(os.path.join(out, "history_summary.json"), "w") as f:
                json.dump({"val_first": val[0], "val_last": val[-1],
                           "epochs": len(val)}, f, indent=1)
    print(f"[archive] wrote {out}")


if __name__ == "__main__":
    main()
