#!/bin/bash
# Completes the round-3 held-out matrix: the thin-lens cells' (gitignored)
# workdirs were wiped by a machine restart, so this retrains them from the
# deterministic seeds/data and evaluates each on the strictly held-out test
# split immediately after it finishes (DFV first: it trains ~3x faster and
# completes the headline DFV aberration-aware-vs-thin-lens comparison
# soonest).  Serialized for the single-tenant TPU with cooldowns
# (.claude/skills/verify/SKILL.md).  Run inside tmux; logs under /tmp/.
set -u
cd /root/repo
OUT=docs/results_dff
TEST=datasets/SynthMiddlebury/test
COOL=180

eval_cell() {
  local script=$1 wd=$2 tag=$3 valdir=$4
  local args=(--workdir "$wd" --eval-only best)
  [ -n "$valdir" ] && args+=(--val-dir "$valdir")
  rm -f "$wd/eval_final.json"
  for attempt in 1 2; do
    echo "=== [thin] $(date +%T) eval $tag attempt $attempt ==="
    timeout 1500 python "$script" "${args[@]}"
    if [ -f "$wd/eval_final.json" ]; then
      cp "$wd/eval_final.json" "$OUT/$tag.json"
      echo "wrote $OUT/$tag.json"
      return 0
    fi
    sleep $COOL
  done
  return 1
}

# Only evaluate a cell once training actually reached the target epoch:
# run_chunked exits 1 when the chunk budget runs out first, and publishing
# an eval of a partially-trained "best" checkpoint under the matrix tag
# would silently corrupt the comparison.
trained() {
  local wd=$1 total=$2
  local ep
  ep=$(python -c "import json; print(json.load(open('$wd/progress.json'))['epoch'])" 2>/dev/null || echo 0)
  [ "$ep" -ge "$total" ]
}

echo "=== [thin] $(date +%T) retrain dfv_thin ==="
bash scripts/run_chunked.sh scripts/4_aber_aware_dff_dfv_synth.py \
  configs/aber_aware_dff_synth_thinlens.yml results/dff_synth_r3/dfv_thin 20 \
  2>&1 | tee /tmp/r3_dfv_thin.log
sleep $COOL
if trained results/dff_synth_r3/dfv_thin 20; then
  eval_cell scripts/4_aber_aware_dff_dfv_synth.py results/dff_synth_r3/dfv_thin \
    r3_test_eval_dfv_thin "$TEST" 2>&1 | tee /tmp/r3_dfv_thin_eval.log
  sleep $COOL
else
  echo "=== [thin] dfv_thin incomplete; skipping eval ===" >&2
fi

echo "=== [thin] $(date +%T) retrain aif_thin ==="
bash scripts/run_chunked.sh scripts/3_aber_aware_dff_synth.py \
  configs/aber_aware_dff_synth_thinlens.yml results/dff_synth_r3/aif_thin 20 \
  2>&1 | tee /tmp/r3_aif_thin.log
sleep $COOL
if trained results/dff_synth_r3/aif_thin 20; then
  eval_cell scripts/3_aber_aware_dff_synth.py results/dff_synth_r3/aif_thin \
    r3_test_eval_aif_thin "$TEST" 2>&1 | tee /tmp/r3_aif_thin_eval.log
else
  echo "=== [thin] aif_thin incomplete; skipping eval ===" >&2
fi
echo "=== [thin] $(date +%T) ALL DONE ==="
