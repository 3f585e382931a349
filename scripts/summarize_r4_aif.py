"""Summarize the round-4 AiFDepthNet 60-epoch convergence campaign.

Reads the two campaign workdirs (results/dff_synth_r4/aif_{ab,thin}, written
by scripts/r4_aif_campaign.sh), the LR-probe workdirs (results/aif_sweep/
lr*), and the held-out eval JSONs the campaign drops in docs/results_dff/
(r4_{test,retex}_eval_aif60{,_thin}.json).  Copies the per-epoch logs into
docs/results_dff/ for the record and emits one aggregate,
docs/results_dff/r4_aif60.json, plus a markdown table for RESULTS_DFF.md.

The comparison baseline is the round-3 20-epoch cells
(r3_test_eval_aif{,_thin}.json), i.e. the question this answers is "does 3x
the step budget move from-scratch AiFDepthNet, and does the aberration-aware
margin appear" — the budget accounting in RESULTS_DFF.md 'Round 4'.

usage: python scripts/summarize_r4_aif.py
"""
from __future__ import annotations

import json
import os
import shutil

REPO = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
OUT = os.path.join(REPO, "docs/results_dff")

CELLS = [
    ("aberration-aware (PSFNet)", "aif_ab", "r4_test_eval_aif60",
     "r4_retex_eval_aif60", "r3_test_eval_aif"),
    ("thin-lens CoC", "aif_thin", "r4_test_eval_aif60_thin",
     "r4_retex_eval_aif60_thin", "r3_test_eval_aif_thin"),
]


def jload(path):
    return json.load(open(path)) if os.path.exists(path) else None


def jsonl(path):
    if not os.path.exists(path):
        return []
    return [json.loads(l) for l in open(path) if l.strip()]


def main():
    agg = {"campaign": "r4 aif 60-epoch convergence",
           "workdir_root": "results/dff_synth_r4", "cells": {}}

    # LR probe record (6 epochs each on the 60-epoch cosine)
    probes = {"1e-4 (r3 baseline)": 0.9065}
    for lr in ("3e-4", "1e-3"):
        log = jsonl(os.path.join(REPO, f"results/aif_sweep/lr{lr}/train_log.jsonl"))
        ep6 = [r for r in log if r.get("epoch") == 6]
        if ep6:
            probes[lr] = ep6[-1]["loss"]
    agg["lr_probe_ep6_train_l1"] = probes

    lines = ["| training renderer | epochs | train L1 (last) | val best AbsRel "
             "| test AbsRel (r3@20ep) | test AbsRel (r4) | retex AbsRel (r4) |",
             "|---|---|---|---|---|---|---|"]
    for renderer, cell, test_tag, retex_tag, r3_tag in CELLS:
        wd = os.path.join(REPO, "results/dff_synth_r4", cell)
        train = jsonl(os.path.join(wd, "train_log.jsonl"))
        metrics = jsonl(os.path.join(wd, "metrics.jsonl"))
        for name in ("train_log", "metrics"):
            src = os.path.join(wd, f"{name}.jsonl")
            if os.path.exists(src):
                shutil.copy(src, os.path.join(OUT, f"r4_aif60_{cell}_{name}.jsonl"))
        test = jload(os.path.join(OUT, f"{test_tag}.json"))
        retex = jload(os.path.join(OUT, f"{retex_tag}.json"))
        r3 = jload(os.path.join(OUT, f"{r3_tag}.json"))
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
            # last-5-validation AbsRel band, the round-3 band-separation
            # statistic (RESULTS_DFF.md "Round-3 retraining matrix")
            "val_abs_rel_band_last5": (
                [round(min(m["abs_rel"] for m in metrics[-5:]), 4),
                 round(max(m["abs_rel"] for m in metrics[-5:]), 4)]
                if len(metrics) >= 2 else None),
            "test_eval": test, "retex_eval": retex,
            "r3_test_eval_20ep": r3,
        }
        agg["cells"][cell] = rec
        fmt = lambda v, p=4: f"{v:.{p}f}" if isinstance(v, (int, float)) else "—"
        lines.append(
            f"| {renderer} | {rec['epochs_trained']} "
            f"| {fmt(rec['train_l1_last'])} | {fmt(rec['val_best_abs_rel'])} "
            f"| {fmt(r3['abs_rel'] if r3 else None)} "
            f"| {fmt(test['abs_rel'] if test else None)} "
            f"| {fmt(retex['abs_rel'] if retex else None)} |")

    print("\n".join(lines))
    print("\nLR probe (epoch-6 train L1 on the 60-epoch cosine):")
    for k, v in probes.items():
        print(f"  lr={k}: {v:.4f}")

    dst = os.path.join(OUT, "r4_aif60.json")
    with open(dst, "w") as f:
        json.dump(agg, f, indent=2)
    print(f"\nwrote {dst}")


if __name__ == "__main__":
    main()
