#!/bin/bash
# Round-3 finishing pipeline, serialized for the single-tenant TPU:
#  1) retrain the two thin-lens matrix cells (their gitignored workdirs were
#     lost to a machine restart; seeds/data are deterministic so this
#     reproduces the committed r3_{aif,dfv}_thin logs),
#  2) run the held-out evaluation matrix (scripts/eval_r3_matrix.sh).
# Run inside tmux; logs under /tmp/r3_*.log.
set -u
cd /root/repo

echo "=== [r3_finish] $(date +%T) retrain aif_thin ==="
bash scripts/run_chunked.sh scripts/3_aber_aware_dff_synth.py \
  configs/aber_aware_dff_synth_thinlens.yml results/dff_synth_r3/aif_thin 20 \
  2>&1 | tee /tmp/r3_aif_thin.log
sleep 240

echo "=== [r3_finish] $(date +%T) retrain dfv_thin ==="
bash scripts/run_chunked.sh scripts/4_aber_aware_dff_dfv_synth.py \
  configs/aber_aware_dff_synth_thinlens.yml results/dff_synth_r3/dfv_thin 20 \
  2>&1 | tee /tmp/r3_dfv_thin.log
sleep 240

echo "=== [r3_finish] $(date +%T) eval matrix ==="
bash scripts/eval_r3_matrix.sh 2>&1 | tee /tmp/r3_eval.log
echo "=== [r3_finish] $(date +%T) ALL DONE ==="
