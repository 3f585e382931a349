#!/bin/bash
# Trimmed held-out eval runner: the machine restart wiped the gitignored
# results/ thin-cell workdirs, so only the committed aberration-aware
# checkpoints can be evaluated this session.  Ordered by value: held-out
# test split first, then texture-generalization retex, then val
# reproduction.  Serialized with cooldowns (verify SKILL.md: single-tenant
# TPU, startup wedges after a killed client).
cd /root/repo
set -u
OUT=docs/results_dff
COOL=240

run_eval() {
  local script=$1 wd=$2 tag=$3 valdir=$4
  local args=(--workdir "$wd" --eval-only best)
  [ -n "$valdir" ] && args+=(--val-dir "$valdir")
  rm -f "$wd/eval_final.json"
  for attempt in 1 2; do
    echo "=== [eval] $(date +%T) $tag attempt $attempt ==="
    timeout 2400 python "$script" "${args[@]}"
    local rc=$?
    if [ -f "$wd/eval_final.json" ]; then
      mv "$wd/eval_final.json" "$OUT/$tag.json"
      echo "wrote $OUT/$tag.json"
      break
    fi
    echo "=== [eval] $tag attempt $attempt failed (rc=$rc), cooling down ==="
    sleep $COOL
  done
  sleep $COOL
}

TEST=datasets/SynthMiddlebury/test
RETEX=datasets/SynthMiddlebury/test_retex
run_eval scripts/3_aber_aware_dff_synth.py     ckpt/dff_synth/aifnet r3_test_eval_aif  "$TEST"
run_eval scripts/4_aber_aware_dff_dfv_synth.py ckpt/dff_synth/dfvnet r3_test_eval_dfv  "$TEST"
run_eval scripts/3_aber_aware_dff_synth.py     ckpt/dff_synth/aifnet r3_retex_eval_aif "$RETEX"
run_eval scripts/4_aber_aware_dff_dfv_synth.py ckpt/dff_synth/dfvnet r3_retex_eval_dfv "$RETEX"
run_eval scripts/3_aber_aware_dff_synth.py     ckpt/dff_synth/aifnet r3_val_eval_aif   ""
run_eval scripts/4_aber_aware_dff_dfv_synth.py ckpt/dff_synth/dfvnet r3_val_eval_dfv   ""
rm -rf ckpt/dff_synth/aifnet/results ckpt/dff_synth/dfvnet/results
echo "=== [eval] all done $(date +%T) ==="
