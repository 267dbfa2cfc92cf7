#!/usr/bin/env python
"""Build the round-3 protocol results table from docs/protocol_r3/.

Prints a markdown table (test2 = unseen-speaker pool) plus the
adaptive-vs-fixed-Q ablation gap with its 2-seed spread — the
"gap exceeds run-to-run noise" evidence VERDICT r2 item 2 asked for.
"""

from __future__ import annotations

import glob
import json
import os

ORDER = ("flagship-s0", "flagship-s1", "flagship-s2", "fixedq-s0",
         "fixedq-s0b", "fixedq-s1", "fixedq-s2", "singlectrl",
         "singlectrl-s1", "auralnet", "auralnet-s1", "passive",
         "passive-s1", "auditorium", "auditorium-s1",
         "auditorium-fixedq", "auditorium-fixedq-s1", "spirit",
         "spirit-fixedq")


def load(root="docs/protocol_r3"):
    out = {}
    for d in glob.glob(os.path.join(root, "*")):
        p = os.path.join(d, "evaluate_biear_metrics_test2.json")
        if os.path.exists(p):
            with open(p) as f:
                out[os.path.basename(d)] = json.load(f)["overall"]
    return out


def main():
    m = load()
    print("| config (seed) | test2 sound_acc | test2 masked AoA "
          "| test2 dist_acc |")
    print("|---|---|---|---|")
    for k in ORDER:
        if k not in m:
            continue
        o = m[k]
        print(f"| {k} | {o['sound_acc']*100:.2f} % "
              f"| {o['aoa_mae_deg_masked']:.2f}° "
              f"| {o['dist_acc']*100:.2f} % |")
    extra = sorted(set(m) - set(ORDER))
    for k in extra:
        o = m[k]
        print(f"| {k} | {o['sound_acc']*100:.2f} % "
              f"| {o['aoa_mae_deg_masked']:.2f}° "
              f"| {o['dist_acc']*100:.2f} % |")

    # seed-0 fixed-Q arm: prefer the bf16-W-policy re-run (fixedq-s0b),
    # which matches the adaptive arms' frontend numerics.
    fixedq_s0 = m.get("fixedq-s0b") or m.get("fixedq-s0")
    pairs = [(m.get("flagship-s0"), fixedq_s0),
             (m.get("flagship-s1"), m.get("fixedq-s1"))]
    pairs = [(a, b) for a, b in pairs if a and b]
    if len(pairs) == 2:
        gaps = {k: [a[k] - b[k] for a, b in pairs]
                for k in ("sound_acc", "dist_acc")}
        gaps["aoa_deg"] = [b["aoa_mae_deg_masked"] - a["aoa_mae_deg_masked"]
                           for a, b in pairs]
        flag = [m[k] for k in ("flagship-s0", "flagship-s1", "flagship-s2")
                if k in m]
        seed_noise = {
            "sound_acc": max(f["sound_acc"] for f in flag)
                         - min(f["sound_acc"] for f in flag),
            "dist_acc": max(f["dist_acc"] for f in flag)
                        - min(f["dist_acc"] for f in flag),
            "aoa_deg": max(f["aoa_mae_deg_masked"] for f in flag)
                       - min(f["aoa_mae_deg_masked"] for f in flag),
        }
        print(f"\nadaptive-vs-fixed-Q gap (per seed) vs flagship "
              f"{len(flag)}-seed spread:")
        for k, g in gaps.items():
            print(f"  {k}: gaps {['%.4f' % x for x in g]}, "
                  f"flagship seed spread {seed_noise[k]:.4f}")

    # reverberant-scene ablation (fleet F): adaptive vs fixed-Q under
    # Auditorium3 BRIRs
    rpairs = [(m.get("auditorium"), m.get("auditorium-fixedq")),
              (m.get("auditorium-s1"), m.get("auditorium-fixedq-s1"))]
    rpairs = [(a, b) for a, b in rpairs if a and b]
    if rpairs:
        print("\nreverberant (Auditorium3) adaptive-vs-fixed-Q gap:")
        for k in ("sound_acc", "dist_acc"):
            print(f"  {k}: gaps "
                  f"{['%.4f' % (a[k] - b[k]) for a, b in rpairs]}")
        print(f"  aoa_deg: gaps "
              f"{['%.4f' % (b['aoa_mae_deg_masked'] - a['aoa_mae_deg_masked']) for a, b in rpairs]}")


if __name__ == "__main__":
    main()
