#!/bin/bash
# Round-4 AiFDepthNet recipe probe (VERDICT r3 #2).
#
# AiFNet's port is exonerated by the cross-framework oracle
# (docs/aifnet_oracle.json) but train L1 plateaus at ~0.85 after 20 epochs at
# the reference lr=1e-4 (/root/reference/configs/aber_aware_dff_aif.yml) —
# a recipe/budget question, not a correctness one.  This probes higher peak
# LRs cheaply: 6 epochs each on the *60-epoch* cosine schedule (so the probe
# sees the same early-LR trajectory the long run will), aberration-aware
# renderer, identical seeds/data.  The lr=1e-4 baseline already exists
# (docs/results_dff/r3_aif_train_log.jsonl: ep6 loss 0.9065, ep20 0.8513 —
# on the 20-epoch cosine, so its early LR decays slightly faster).
#
# usage: bash scripts/r4_aif_sweep.sh   (serial TPU; ~15 min/lr incl cooldowns)
set -u
cd "$(dirname "$0")/.."

for lr in 3e-4 1e-3; do
  wd=results/aif_sweep/lr$lr
  mkdir -p "$wd"
  for i in 1 2 3; do
    ep=$(python -c "import json; print(json.load(open('$wd/progress.json'))['epoch'])" 2>/dev/null || echo 0)
    if [ "$ep" -ge 6 ]; then break; fi
    echo "[r4_aif_sweep] lr=$lr chunk $i from epoch $ep"
    timeout 2100 python scripts/3_aber_aware_dff_synth.py \
      --workdir "$wd" --total-epochs 60 --epochs-per-chunk $((6 - ep)) \
      --time-budget 480 --lr "$lr" --validate-every 3
    sleep 120
  done
done

echo "[r4_aif_sweep] train-loss trajectories:"
for lr in 3e-4 1e-3; do
  echo "-- lr=$lr"; cat "results/aif_sweep/lr$lr/train_log.jsonl" 2>/dev/null
done
