"""Summarize the round-5 AiFDepthNet 60-epoch campaign restart.

Round 4's campaign (docs/results_dff/r4_aif60.json) ended mid-flight at
ab=28 / thin=31 epochs, and its resumable chunk state lived in the
gitignored results/ tree — which the round-5 environment reset wiped.  So
round 5 RERUNS both cells from scratch (scripts/r5_campaign.sh) rather than
resuming, now with the K-steps-per-dispatch train path (docs/kstep_ab.json)
making 60 epochs affordable.  This reads the two workdirs
(results/dff_synth_r5/aif_{ab,thin}), copies the per-epoch logs into
docs/results_dff/, and emits docs/results_dff/r5_aif60.json plus the
markdown table for RESULTS_DFF.md.  Comparisons: the round-3 20-epoch cells
and the round-4 deadline-pass snapshots.

Reference protocol being reproduced: /root/reference/2_aber_aware_dff_aif.py
:129-244 (per-epoch validation, metric-gated best checkpoints, held-out eval).

usage: python scripts/summarize_r5_aif.py
"""
from __future__ import annotations

import json
import os
import shutil

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
OUT = os.path.join(REPO, "docs/results_dff")

CELLS = [
    ("aberration-aware (PSFNet)", "aif_ab", "r5_test_eval_aif60",
     "r5_retex_eval_aif60", "r3_test_eval_aif", "r4_test_eval_aif60"),
    ("thin-lens CoC", "aif_thin", "r5_test_eval_aif60_thin",
     "r5_retex_eval_aif60_thin", "r3_test_eval_aif_thin",
     "r4_test_eval_aif60_thin"),
]


def jload(path):
    return json.load(open(path)) if os.path.exists(path) else None


def jsonl(path):
    if not os.path.exists(path):
        return []
    return [json.loads(l) for l in open(path) if l.strip()]


def main():
    agg = {"campaign": "r5 aif 60-epoch rerun (r4 chunk state wiped with the "
                       "round-5 environment; fresh cells, lr=1e-4 per the r4 "
                       "LR-probe negative result, k-per-dispatch train path)",
           "workdir_root": "results/dff_synth_r5", "cells": {}}

    lines = ["| training renderer | epochs | train L1 (last) | val best AbsRel "
             "| test AbsRel (r3@20ep) | test AbsRel (r4@28-31ep) "
             "| test AbsRel (r5) | retex AbsRel (r5) |",
             "|---|---|---|---|---|---|---|---|"]
    for renderer, cell, test_tag, retex_tag, r3_tag, r4_tag in CELLS:
        wd = os.path.join(REPO, "results/dff_synth_r5", cell)
        train = jsonl(os.path.join(wd, "train_log.jsonl"))
        metrics = jsonl(os.path.join(wd, "metrics.jsonl"))
        for name in ("train_log", "metrics"):
            src = os.path.join(wd, f"{name}.jsonl")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(OUT, f"r5_aif60_{cell}_{name}.jsonl"))
        test = jload(os.path.join(OUT, f"{test_tag}.json"))
        retex = jload(os.path.join(OUT, f"{retex_tag}.json"))
        r3 = jload(os.path.join(OUT, f"{r3_tag}.json"))
        r4 = jload(os.path.join(OUT, f"{r4_tag}.json"))
        rec = {
            "renderer": renderer,
            "epochs_trained": train[-1]["epoch"] if train else 0,
            "train_l1_last": train[-1]["loss"] if train else None,
            "train_l1_ep20": next((r["loss"] for r in train
                                   if r.get("epoch") == 20), None),
            "val_best_abs_rel": (min(m["abs_rel"] for m in metrics)
                                 if metrics else None),
            "val_best_mse_epoch": (min(metrics, key=lambda m: m["mse"])["epoch"]
                                   if metrics else None),
            "val_abs_rel_band_last5": (
                [round(min(m["abs_rel"] for m in metrics[-5:]), 4),
                 round(max(m["abs_rel"] for m in metrics[-5:]), 4)]
                if len(metrics) >= 2 else None),
            "test_eval": test, "retex_eval": retex,
            "r3_test_eval_20ep": r3,
            "r4_test_eval_deadline_pass": r4,
        }
        agg["cells"][cell] = rec
        fmt = lambda v, p=4: f"{v:.{p}f}" if isinstance(v, (int, float)) else "—"
        lines.append(
            f"| {renderer} | {rec['epochs_trained']} "
            f"| {fmt(rec['train_l1_last'])} | {fmt(rec['val_best_abs_rel'])} "
            f"| {fmt(r3['abs_rel'] if r3 else None)} "
            f"| {fmt(r4['abs_rel'] if r4 else None)} "
            f"| {fmt(test['abs_rel'] if test else None)} "
            f"| {fmt(retex['abs_rel'] if retex else None)} |")

    print("\n".join(lines))
    dst = os.path.join(OUT, "r5_aif60.json")
    with open(dst, "w") as f:
        json.dump(agg, f, indent=2)
    print(f"\nwrote {dst}")


if __name__ == "__main__":
    main()
