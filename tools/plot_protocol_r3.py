#!/usr/bin/env python
"""Validation-curve figure for the round-3 protocol ablation.

Two small multiples (val sound accuracy, val AoA MAE in degrees) over
the 150 training epochs, adaptive-Q flagship vs fixed-Q ablation, one
line per seed. Writes docs/protocol_r3/curves.png.

Reads histories from runs_protocol_r3/ run dirs (gitignored) by comment
suffix; falls back to any archived history_summary-only labels being
absent silently (the figure shows whichever runs exist).
"""

from __future__ import annotations

import glob
import json
import os

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
RUNS = os.path.join(ROOT, "runs_protocol_r3")
OUT = os.path.join(ROOT, "docs", "protocol_r3", "curves.png")

# arm -> (label, hex) — fixed categorical assignment (slot1 blue, slot2
# orange from the validated default palette); seeds share the arm's hue.
ARMS = {
    "flagship": ("adaptive-Q (dual)", "#2a78d6",
                 ["r3-flagship", "r3-flagship-s1"]),
    "singlectrl": ("adaptive-Q (single)", "#1baf7a",
                   ["r3-singlectrl", "r3-singlectrl-s1"]),
    "fixedq": ("fixed-Q", "#eb6834",
               ["r3-fixedq-rerun", "r3-fixedq", "r3-fixedq-s1"]),
}
SEED_STYLE = ["-", (0, (4, 2))]  # seed order: solid, dashed

INK = "#0b0b0b"
MUTED = "#52514e"
SURFACE = "#fcfcfb"
GRID = "#e4e3df"


# run-comment suffix -> archived docs/protocol_r3/<label>/ dir, for
# histories whose (gitignored) run dir no longer exists.
ARCHIVE_LABEL = {
    "r3-flagship": "flagship-s0",
    "r3-fixedq": "fixedq-s0",
    "r3-fixedq-rerun": "fixedq-s0b",
    "r3-flagship-s1": "flagship-s1",
    "r3-fixedq-s1": "fixedq-s1",
    "r3-singlectrl": "singlectrl",
    "r3-singlectrl-s1": "singlectrl-s1",
}


def find_history(suffix):
    candidates = [os.path.join(d, "logs_json", "history.json")
                  for d in sorted(glob.glob(os.path.join(RUNS, f"*_{suffix}")))]
    label = ARCHIVE_LABEL.get(suffix, suffix.replace("r3-", ""))
    candidates.append(os.path.join(ROOT, "docs", "protocol_r3", label,
                                   "history.json"))
    for p in candidates:
        if os.path.exists(p):
            with open(p) as f:
                return json.load(f)["val"]
    return None


def main():
    fig, axes = plt.subplots(1, 2, figsize=(9.6, 3.4), dpi=200)
    fig.patch.set_facecolor(SURFACE)
    panels = [("val sound accuracy (%)",
               lambda v: 100.0 * v["sound_acc"]),
              ("val AoA MAE (all sectors, °)",
               lambda v: 45.0 * v["aoa_mae"])]
    plotted = []
    for arm, (label, hue, suffixes) in ARMS.items():
        # dedupe: r3-fixedq-rerun replaces r3-fixedq if both exist
        seeds_done = set()
        first = True
        for sfx in suffixes:
            seed = 1 if sfx.endswith("-s1") else 0
            if seed in seeds_done:
                continue  # e.g. rerun already covered seed 0
            hist = find_history(sfx)
            if hist is None:
                continue
            seeds_done.add(seed)
            style = SEED_STYLE[seed]
            for ax, (_, get) in zip(axes, panels):
                ax.plot(range(1, len(hist) + 1), [get(v) for v in hist],
                        color=hue, lw=1.6, ls=style, solid_capstyle="round")
            plotted.append((label if first else None, hue, style, seed,
                            hist))
            first = False
    for ax, (title, get) in zip(axes, panels):
        ax.set_facecolor(SURFACE)
        ax.set_title(title, fontsize=10, color=INK, loc="left")
        ax.set_xlabel("epoch", fontsize=9, color=MUTED)
        ax.tick_params(colors=MUTED, labelsize=8)
        ax.grid(True, color=GRID, lw=0.6)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color(GRID)
    # direct labels at the right edge of panel 1 (sound acc), one per arm
    ends = {}
    for label, hue, style, seed, hist in plotted:
        if label:
            ends[label] = (hue, len(hist), 100.0 * hist[-1]["sound_acc"])
    # nudge apart if close
    ys = sorted(ends.items(), key=lambda kv: kv[1][2])
    for i, (label, (hue, x, y)) in enumerate(ys):
        if i and y - ys[i - 1][1][2] < 1.2:
            y = ys[i - 1][1][2] + 1.2
            ends[label] = (hue, x, y)
        axes[0].annotate(label, (x, y), xytext=(4, 0),
                         textcoords="offset points", fontsize=8.5,
                         color=INK, va="center")
    axes[0].set_xlim(right=axes[0].get_xlim()[1] * 1.38)
    seen_labels = {}
    for l, h, s, seed, _ in plotted:
        if l:
            seen_labels[h] = l
    handles = [plt.Line2D([], [], color=h, lw=1.6, ls=s,
                          label=f"{seen_labels.get(h, '')} seed {seed}")
               for l, h, s, seed, _ in plotted]
    leg = axes[1].legend(handles=handles, fontsize=7.5, frameon=False,
                         loc="upper right", labelcolor=MUTED)
    fig.suptitle("Round-3 protocol (speech corpus + 5–25 dB noise): "
                 "adaptive-Q vs fixed-Q", fontsize=11, color=INK, x=0.01,
                 ha="left")
    fig.tight_layout(rect=(0, 0, 1, 0.92))
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    fig.savefig(OUT, facecolor=SURFACE)
    print("wrote", OUT)


if __name__ == "__main__":
    main()
