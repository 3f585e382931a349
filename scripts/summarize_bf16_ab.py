"""Summarize the bf16-trunk quality A/B (VERDICT r4 weak #7 / next-step #6).

Round-5 design: instead of two dedicated cells, the bf16 side is a TWIN of
the 60-epoch campaign's aberration-aware cell — same seed (126), same
lr=1e-4 cosine over 60 epochs, same data order, validation every 3 —
trained with `--bf16` (AiFDepthNet(dtype=bfloat16)) and stopped at epoch 12
(results/r5_bf16_ab/bf16).  The f32 control is the campaign cell itself
(results/dff_synth_r5/aif_ab) truncated to the same epoch budget, so the
control costs no extra chip time.  The decision rule DESIGN.md section 9
asked for: flip the campaign default to bf16 iff its val-metric band
overlaps f32's (quality holds) — the measured -12.9% step time is then
free budget.
"""
import json
import os

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")

CELLS = {
    "f32": "results/dff_synth_r5/aif_ab",     # campaign cell = control
    "bf16": "results/r5_bf16_ab/bf16",        # --bf16 twin, stopped at ep 12
}


def cell(wd, max_epoch=None):
    wd = os.path.join(ROOT, wd)
    train = [json.loads(l) for l in open(os.path.join(wd, "train_log.jsonl"))]
    try:
        val = [json.loads(l) for l in open(os.path.join(wd, "metrics.jsonl"))]
    except FileNotFoundError:
        val = []
    if max_epoch is not None:
        train = [r for r in train if r["epoch"] <= max_epoch]
        val = [r for r in val if r["epoch"] <= max_epoch]
    out = {
        "epochs_compared": max(r["epoch"] for r in train),
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
    bf16 = cell(CELLS["bf16"])
    budget = bf16["epochs_compared"]
    cells = {"bf16": bf16, "f32": cell(CELLS["f32"], max_epoch=budget)}
    summary = {"campaign": "r5 bf16-trunk quality A/B — bf16 twin of the "
                           "60-epoch campaign ab cell (same seed/schedule/"
                           f"data order), compared at epoch <= {budget}",
               "timing_note": "mean_epoch_sec is NOT the dtype timing claim: "
                              "the cells span different chunk counts and each "
                              "chunk restart pays a compile epoch.  The "
                              "controlled step-time number is the -12.9% "
                              "measured in docs/step_variant_profile.jsonl "
                              "(DESIGN.md section 9).",
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
