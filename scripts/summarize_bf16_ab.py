"""Summarize the bf16-trunk quality A/B (VERDICT r4 weak #7 / next-step #6).

Two same-seed AiF cells at the real operating point (bs=2, stack=8, 480x640,
lr 1e-4 cosine over 12 epochs): f32 vs AiFDepthNet(dtype=bfloat16) via
--bf16.  The decision rule DESIGN.md section 9 asked for: flip the campaign
default to bf16 iff its val-metric band overlaps f32's (quality holds) —
the measured -12.9% step time is then free budget.
"""
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def cell(name):
    wd = os.path.join(ROOT, "results/r5_bf16_ab", name)
    train = [json.loads(l) for l in open(os.path.join(wd, "train_log.jsonl"))]
    try:
        val = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    except FileNotFoundError:
        val = []
    out = {
        "epochs_trained": max(r["epoch"] for r in train),
        "train_l1_by_epoch": {r["epoch"]: r["loss"] for r in train},
        "mean_epoch_sec": round(
            sum(r["sec"] for r in train if r["epoch"] > 1)
            / max(sum(1 for r in train if r["epoch"] > 1), 1), 1),
        "val_abs_rel": {r["epoch"]: round(r["abs_rel"], 4) for r in val},
        "val_mse": {r["epoch"]: round(r["mse"], 4) for r in val},
    }
    if val:
        out["val_abs_rel_best"] = min(r["abs_rel"] for r in val)
        out["val_mse_best"] = min(r["mse"] for r in val)
    return out


def main():
    cells = {name: cell(name) for name in ("f32", "bf16")}
    summary = {"campaign": "r5 bf16-trunk quality A/B (same seed, 12-epoch cosine)",
               "cells": cells}
    if all("val_abs_rel_best" in c for c in cells.values()):
        f32b = cells["f32"]["val_abs_rel_best"]
        bf16b = cells["bf16"]["val_abs_rel_best"]
        # quality holds if bf16's best val AbsRel is within 5% rel of f32's
        # (well inside the run-to-run band measured across r3/r4 campaigns)
        summary["quality_holds"] = bool(bf16b <= f32b * 1.05)
        summary["abs_rel_best"] = {"f32": round(f32b, 4),
                                   "bf16": round(bf16b, 4)}
    path = os.path.join(ROOT, "docs/bf16_ab.json")
    with open(path, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary, indent=1))


if __name__ == "__main__":
    main()
