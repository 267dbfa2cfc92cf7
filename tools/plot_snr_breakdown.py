#!/usr/bin/env python
"""Figure: adaptive-vs-fixed-Q gap sliced by noise level.

Reads docs/protocol_r3/snr_breakdown.json (tools/eval_by_snr.py) and
renders two small multiples — test2 sound accuracy and presence-masked
AoA MAE vs the SNR of the evaluation slice, one line per config, with
the no-noise slice as a detached "clean" point on the right.

Writes docs/protocol_r3/snr_breakdown.png.
"""

from __future__ import annotations

import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SRC = os.path.join(ROOT, "docs", "protocol_r3", "snr_breakdown.json")
OUT = os.path.join(ROOT, "docs", "protocol_r3", "snr_breakdown.png")

# fixed categorical assignment shared with curves.png (color follows the
# entity): flagship blue, fixed-Q orange, single-controller aqua,
# AuralNet yellow — validated default palette slots 1-4.
HUES = {
    "flagship": "#2a78d6",
    "fixedq": "#eb6834",
    "singlectrl": "#1baf7a",
    "auralnet": "#eda100",
}
LABELS = {
    "flagship": "adaptive-Q (dual)",
    "fixedq": "fixed-Q",
    "singlectrl": "adaptive-Q (single)",
    "auralnet": "AuralNet",
}

INK = "#0b0b0b"
MUTED = "#52514e"
SURFACE = "#fcfcfb"
GRID = "#e4e3df"


def arm_of(label: str) -> str:
    for arm in HUES:
        if label.startswith(arm):
            return arm
    return "flagship"


def main():
    with open(SRC) as f:
        data = json.load(f)

    panels = [("test2 sound accuracy (%)",
               lambda r: 100.0 * r["sound_acc"]),
              ("test2 masked AoA MAE (°)",
               lambda r: r["aoa_mae_deg_masked"])]
    fig, axes = plt.subplots(1, 2, figsize=(9.6, 3.4), dpi=200)
    fig.patch.set_facecolor(SURFACE)

    runs = data["runs"]
    # x positions: numeric SNRs, then a gapped slot for "clean"
    any_rows = next(iter(runs.values()))
    snrs = sorted(float(t[:-2]) for t in any_rows if t.endswith("dB"))
    clean_x = (snrs[-1] + (snrs[-1] - snrs[0]) * 0.22) if snrs else 1.0

    for ax, (title, get) in zip(axes, panels):
        for label, rows in runs.items():
            arm = arm_of(label)
            hue = HUES[arm]
            xs = [s for s in snrs if f"{s:g}dB" in rows]
            ys = [get(rows[f"{s:g}dB"]) for s in xs]
            ax.plot(xs, ys, color=hue, lw=2.0, marker="o", ms=4.5,
                    label=LABELS[arm], solid_capstyle="round")
            if "clean" in rows:
                ax.plot([clean_x], [get(rows["clean"])], color=hue,
                        marker="o", ms=5.5, mec=SURFACE, mew=1.2)
        ax.set_xticks(snrs + [clean_x],
                      [f"{s:g}" for s in snrs] + ["clean"])
        ax.axvline(snrs[-1] + (clean_x - snrs[-1]) / 2, color=GRID,
                   lw=0.8, ls=(0, (2, 2)))
        ax.set_facecolor(SURFACE)
        ax.set_title(title, fontsize=10, color=INK, loc="left")
        ax.set_xlabel("evaluation SNR (dB)", fontsize=9, color=MUTED)
        ax.tick_params(colors=MUTED, labelsize=8)
        ax.grid(True, color=GRID, lw=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
    axes[0].legend(fontsize=8, frameon=False, loc="best",
                   labelcolor=MUTED)
    fig.suptitle("Where adaptivity pays: the Q-controller gap by noise "
                 f"level (unseen-speaker test2, seed {data['seed']})",
                 fontsize=11, color=INK, x=0.01, ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    fig.savefig(OUT, facecolor=SURFACE)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
