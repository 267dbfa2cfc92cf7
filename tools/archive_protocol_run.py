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
    ap.add_argument("--no-checkpoint", action="store_true",
                    help="skip the best-checkpoint .pth export")
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
        # Full history (needed to re-render the validation-curve figure
        # after the gitignored run dir is gone) + the compact summary.
        shutil.copy(hist_path, os.path.join(out, "history.json"))
        with open(hist_path) as f:
            hist = json.load(f)
        val = hist.get("val", [])
        if val:
            with open(os.path.join(out, "history_summary.json"), "w") as f:
                json.dump({"val_first": val[0], "val_last": val[-1],
                           "epochs": len(val)}, f, indent=1)

    if not args.no_checkpoint:
        try:
            _export_best(args.run_dir, out)
        except Exception as e:  # archiving must never fail the fleet
            print(f"[archive] checkpoint export failed (skipped): {e!r}")
    print(f"[archive] wrote {out}")


def _export_best(run_dir: str, out: str) -> None:
    """Export the run's best checkpoint as a reference-format .pth (or a
    flat npz where no torch layout exists, e.g. AuralNet) so trained
    weights survive VM resets and the judge can run evaluate_biear.py
    against the committed artifact directly."""
    best = os.path.join(run_dir, "checkpoints", "best")
    if not os.path.isdir(best):
        print(f"[archive] no best checkpoint at {best}")
        return
    # Host-only work: force CPU (setdefault would silently keep the
    # harness-preset TPU platform). Must happen before the first jax
    # import below.
    os.environ["JAX_PLATFORMS"] = "cpu"
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from biear_tpu.config import config_from_settings
    from biear_tpu.train.evaluate import load_params

    with open(os.path.join(run_dir, "meta", "settings.json")) as f:
        settings = json.load(f)
    cfg, _, _ = config_from_settings(settings)
    kind = str(settings.get("MODEL_KIND", "active"))
    params = load_params(best, cfg, kind)
    try:
        from biear_tpu.train.state import export_torch_pth
        export_torch_pth(os.path.join(out, "best.pth"), params, cfg)
        print(f"[archive] exported {out}/best.pth")
    except Exception as e:
        import numpy as np
        import jax
        leaves = {"/".join(map(str, path)): np.asarray(leaf)
                  for path, leaf in
                  jax.tree_util.tree_flatten_with_path(params)[0]}
        np.savez_compressed(os.path.join(out, "best_params.npz"), **leaves)
        print(f"[archive] torch export unavailable ({e!r}); "
              f"wrote best_params.npz")


if __name__ == "__main__":
    main()
