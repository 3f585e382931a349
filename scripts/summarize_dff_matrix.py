"""Summarize the round-3 DFF retraining matrix into one comparison table.

Reads the four workdirs under results/dff_synth_r3/ ({aif,aif_thin,dfv,
dfv_thin}), picks each run's best-MSE epoch from metrics.jsonl (the same
criterion the trainers use for depth_net_best — reference
2_aber_aware_dff_aif.py:221-227 gates on best metric), and emits a markdown
table plus docs/results_dff/r3_matrix.json for RESULTS_DFF.md.

usage: python scripts/summarize_dff_matrix.py [--root results/dff_synth_r3]
"""
from __future__ import annotations

import argparse
import json
import os

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

RUNS = [
    ("AiFDepthNet", "aberration-aware (PSFNet)", "aif"),
    ("AiFDepthNet", "thin-lens CoC", "aif_thin"),
    ("DFVNet", "aberration-aware (PSFNet)", "dfv"),
    ("DFVNet", "thin-lens CoC", "dfv_thin"),
]


def load_run(workdir: str) -> dict | None:
    path = os.path.join(workdir, "metrics.jsonl")
    if not os.path.exists(path):
        return None
    rows = [json.loads(l) for l in open(path) if l.strip()]
    if not rows:
        return None
    best = min(rows, key=lambda r: r["mse"])
    return {"best_epoch": best["epoch"], "epochs_logged": len(rows),
            "last_epoch": rows[-1]["epoch"], "best": best,
            "abs_rel_band": [round(min(r["abs_rel"] for r in rows[-5:]), 4),
                             round(max(r["abs_rel"] for r in rows[-5:]), 4)]}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default=os.path.join(REPO, "results/dff_synth_r3"))
    args = ap.parse_args()

    out = {}
    lines = ["| model | training renderer | best ep | AbsRel ↓ | MAE ↓ | RMSE ↓ | δ<1.25 ↑ |",
             "|---|---|---|---|---|---|---|"]
    for model, renderer, sub in RUNS:
        r = load_run(os.path.join(args.root, sub))
        key = f"{model}/{sub}"
        out[key] = r
        if r is None:
            lines.append(f"| {model} | {renderer} | — | (no metrics.jsonl) | | | |")
            continue
        b = r["best"]
        lines.append(
            f"| {model} | {renderer} | {r['best_epoch']} | {b['abs_rel']:.4f} "
            f"| {b['mae']:.3f} | {b['rmse']:.3f} | {b['acc1']:.3f} |")
    print("\n".join(lines))

    dst = os.path.join(REPO, "docs/results_dff/r3_matrix.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"\nwrote {dst}")


if __name__ == "__main__":
    main()
