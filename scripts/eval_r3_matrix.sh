#!/bin/bash
# Round-3 post-training evaluations, serialized for the single-tenant TPU:
#  1) reproduce the committed (stripped) best checkpoints on the val split,
#  2) evaluate all four matrix cells once on the strictly held-out 16-scene
#     procedural test split (third RNG stream; neither the geometry nor the
#     textures ever touched training or checkpoint selection),
#  3) probe texture generalization on test_retex/ (val depth geometry with
#     fresh textures — reported separately, never averaged into test).
# Outputs land in docs/results_dff/ as r3_{val,test,retex}_eval_<cell>.json.
cd /root/repo
set -u
OUT=docs/results_dff
COOL=240   # cooldown between TPU clients (verify SKILL.md)

run_eval() {
  # timeout must absorb a relay-startup wedge (6-18 min, memory: tpu-relay
  # wedges) on top of the eval itself; retry once after a long cooldown if
  # the first attempt produced no eval_final.json.
  local script=$1 wd=$2 tag=$3 valdir=$4
  local args=(--workdir "$wd" --eval-only best)
  [ -n "$valdir" ] && args+=(--val-dir "$valdir")
  # a stale eval_final.json from an earlier run would be mis-published
  # under this tag if the attempt times out before writing — clear it
  rm -f "$wd/eval_final.json"
  for attempt in 1 2; do
    echo "=== [eval] $(date +%T) $tag attempt $attempt (workdir=$wd valdir=${valdir:-val}) ==="
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
  echo "=== [eval] $(date +%T) $tag done (rc=$rc) ==="
  sleep $COOL
}

TEST=datasets/SynthMiddlebury/test
RETEX=datasets/SynthMiddlebury/test_retex
run_eval scripts/3_aber_aware_dff_synth.py     ckpt/dff_synth/aifnet        r3_val_eval_aif      ""
run_eval scripts/4_aber_aware_dff_dfv_synth.py ckpt/dff_synth/dfvnet        r3_val_eval_dfv      ""
run_eval scripts/3_aber_aware_dff_synth.py     ckpt/dff_synth/aifnet        r3_test_eval_aif     "$TEST"
run_eval scripts/4_aber_aware_dff_dfv_synth.py ckpt/dff_synth/dfvnet        r3_test_eval_dfv     "$TEST"
run_eval scripts/3_aber_aware_dff_synth.py     results/dff_synth_r3/aif_thin r3_test_eval_aif_thin "$TEST"
run_eval scripts/4_aber_aware_dff_dfv_synth.py results/dff_synth_r3/dfv_thin r3_test_eval_dfv_thin "$TEST"
run_eval scripts/3_aber_aware_dff_synth.py     ckpt/dff_synth/aifnet        r3_retex_eval_aif    "$RETEX"
run_eval scripts/4_aber_aware_dff_dfv_synth.py ckpt/dff_synth/dfvnet        r3_retex_eval_dfv    "$RETEX"
# keep the committed checkpoint dirs clean (only the msgpack is tracked)
rm -rf ckpt/dff_synth/aifnet/results ckpt/dff_synth/dfvnet/results
echo "=== [eval] all done $(date +%T) ==="
