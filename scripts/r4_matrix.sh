#!/bin/bash
# Round-4 matrix completion (VERDICT.md r3 #1), serialized for the
# single-tenant TPU:
#  1) finish the dfv_thin cell (epochs 16-20; the workdir holds the full
#     ep15 TrainState incl. opt_state, so the resume is faithful),
#  2) retrain aif_thin from scratch (its workdir was lost to the restart),
#  3) evaluate both thin-lens cells on the strictly held-out test split
#     (and test_retex for symmetry with the aberration-aware cells), giving
#     the full (model x renderer) held-out matrix in docs/results_dff/.
# Run inside tmux / background; logs under /tmp/r4_*.log.
set -u
cd /root/repo
OUT=docs/results_dff
TEST=datasets/SynthMiddlebury/test
RETEX=datasets/SynthMiddlebury/test_retex
COOL=180

trained() {
  local wd=$1 total=$2
  local ep
  ep=$(python -c "import json; print(json.load(open('$wd/progress.json'))['epoch'])" 2>/dev/null || echo 0)
  [ "$ep" -ge "$total" ]
}

eval_cell() {
  local script=$1 wd=$2 tag=$3 valdir=$4
  local args=(--workdir "$wd" --eval-only best)
  [ -n "$valdir" ] && args+=(--val-dir "$valdir")
  rm -f "$wd/eval_final.json"
  for attempt in 1 2; do
    echo "=== [r4] $(date +%T) eval $tag attempt $attempt ==="
    timeout 2400 python "$script" "${args[@]}"
    if [ -f "$wd/eval_final.json" ]; then
      cp "$wd/eval_final.json" "$OUT/$tag.json"
      echo "wrote $OUT/$tag.json"
      sleep $COOL
      return 0
    fi
    sleep $COOL
  done
  echo "=== [r4] eval $tag FAILED ===" >&2
  return 1
}

echo "=== [r4] $(date +%T) finish dfv_thin (ep16-20) ==="
bash scripts/run_chunked.sh scripts/4_aber_aware_dff_dfv_synth.py \
  configs/aber_aware_dff_synth_thinlens.yml results/dff_synth_r3/dfv_thin 20 \
  2>&1 | tee /tmp/r4_dfv_thin.log
sleep $COOL
if trained results/dff_synth_r3/dfv_thin 20; then
  eval_cell scripts/4_aber_aware_dff_dfv_synth.py results/dff_synth_r3/dfv_thin \
    r3_test_eval_dfv_thin "$TEST" 2>&1 | tee /tmp/r4_dfv_thin_eval.log
  eval_cell scripts/4_aber_aware_dff_dfv_synth.py results/dff_synth_r3/dfv_thin \
    r3_retex_eval_dfv_thin "$RETEX" 2>&1 | tee /tmp/r4_dfv_thin_retex.log
else
  echo "=== [r4] dfv_thin incomplete; skipping eval ===" >&2
fi

echo "=== [r4] $(date +%T) retrain aif_thin from scratch ==="
bash scripts/run_chunked.sh scripts/3_aber_aware_dff_synth.py \
  configs/aber_aware_dff_synth_thinlens.yml results/dff_synth_r3/aif_thin 20 \
  2>&1 | tee /tmp/r4_aif_thin.log
sleep $COOL
if trained results/dff_synth_r3/aif_thin 20; then
  eval_cell scripts/3_aber_aware_dff_synth.py results/dff_synth_r3/aif_thin \
    r3_test_eval_aif_thin "$TEST" 2>&1 | tee /tmp/r4_aif_thin_eval.log
  eval_cell scripts/3_aber_aware_dff_synth.py results/dff_synth_r3/aif_thin \
    r3_retex_eval_aif_thin "$RETEX" 2>&1 | tee /tmp/r4_aif_thin_retex.log
else
  echo "=== [r4] aif_thin incomplete; skipping eval ===" >&2
fi
echo "=== [r4] $(date +%T) ALL DONE ==="
