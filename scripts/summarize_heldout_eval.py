"""Summarize the round-3 held-out evaluations into one comparison table.

Reads the per-cell eval JSONs that scripts/eval_r3_matrix.sh drops in
docs/results_dff/ (r3_val_eval_* reproduce the committed checkpoints on the
val split; r3_test_eval_* are the one-shot evaluations on the strictly
held-out 16-scene procedural test split; r3_retex_eval_* probe texture
generalization on val geometry with fresh textures) and emits a markdown
table plus docs/results_dff/r3_heldout.json for RESULTS_DFF.md.

usage: python scripts/summarize_heldout_eval.py
"""
from __future__ import annotations

import json
import os

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
OUT = os.path.join(REPO, "docs/results_dff")

CELLS = [
    ("AiFDepthNet", "aberration-aware (PSFNet)", "aif"),
    ("AiFDepthNet", "thin-lens CoC", "aif_thin"),
    ("DFVNet", "aberration-aware (PSFNet)", "dfv"),
    ("DFVNet", "thin-lens CoC", "dfv_thin"),
]
SPLITS = ["val", "test", "retex"]


def main():
    out = {}
    for split in SPLITS:
        lines = [f"### {split}",
                 "| model | training renderer | AbsRel ↓ | MAE ↓ | RMSE ↓ | δ<1.25 ↑ |",
                 "|---|---|---|---|---|---|"]
        any_found = False
        for model, renderer, cell in CELLS:
            path = os.path.join(OUT, f"r3_{split}_eval_{cell}.json")
            if not os.path.exists(path):
                continue
            any_found = True
            r = json.load(open(path))
            out[f"{split}/{model}/{cell}"] = r
            lines.append(
                f"| {model} | {renderer} | {r['abs_rel']:.4f} "
                f"| {r.get('mae', float('nan')):.3f} | {r['rmse']:.3f} "
                f"| {r['acc1']:.3f} |")
        if any_found:
            print("\n".join(lines) + "\n")

    dst = os.path.join(OUT, "r3_heldout.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {dst} ({len(out)} cells)")


if __name__ == "__main__":
    main()
