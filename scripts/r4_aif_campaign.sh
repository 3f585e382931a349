#!/bin/bash
# Round-4 AiFDepthNet convergence campaign (VERDICT r3 #2).
#
# The port is exonerated by the cross-framework oracle
# (docs/aifnet_oracle.json); what remains is the recipe/budget: at the
# reference lr=1e-4 and 20 epochs, train L1 plateaus at ~0.85 and the model
# does not generalize to the held-out split.  This campaign:
#   1) probes higher peak LRs cheaply (scripts/r4_aif_sweep.sh: 6 epochs each
#      on the 60-epoch cosine),
#   2) picks the LR with the lowest epoch-6 train loss (falling back to the
#      reference 1e-4 if neither probe beats its known 0.9065),
#   3) extends BOTH renderer cells (aberration-aware + thin-lens CoC) to 60
#      epochs at that LR, alternating chunks between the cells so a
#      wall-clock cutoff leaves them at comparable budgets,
#   4) evaluates each cell's best checkpoint on the strictly held-out test
#      split and on test_retex.
#
# Deadline-aware: set R4_DEADLINE_TS (unix seconds) to stop starting new
# chunks past it; evals still run on whatever the cells reached.
# usage: bash scripts/r4_aif_campaign.sh   (background; log /tmp/r4_campaign.log)
set -u
cd /root/repo
OUT=docs/results_dff
TEST=datasets/SynthMiddlebury/test
RETEX=datasets/SynthMiddlebury/test_retex
TOTAL=60
COOL=150
DEADLINE=${R4_DEADLINE_TS:-$(( $(date +%s) + 18000 ))}

echo "=== [r4-aif] $(date +%T) LR sweep ==="
bash scripts/r4_aif_sweep.sh 2>&1 | tee /tmp/r4_aif_sweep.log

BEST=$(python - <<'EOF'
import json, os
# baseline: reference lr=1e-4 reached train L1 0.9065 at epoch 6
# (docs/results_dff/r3_aif_train_log.jsonl, 20-epoch cosine)
best_lr, best_loss = "1e-4", 0.9065
for lr in ("3e-4", "1e-3"):
    path = f"results/aif_sweep/lr{lr}/train_log.jsonl"
    if not os.path.exists(path):
        continue
    recs = [json.loads(l) for l in open(path)]
    ep6 = [r for r in recs if r.get("epoch") == 6]
    if ep6 and ep6[-1]["loss"] < best_loss:
        best_lr, best_loss = lr, ep6[-1]["loss"]
print(best_lr)
EOF
)
echo "=== [r4-aif] picked lr=$BEST ==="

ep_of() {
  python -c "import json; print(json.load(open('$1/progress.json'))['epoch'])" \
    2>/dev/null || echo 0
}

chunk() {  # config workdir
  timeout 2100 python scripts/3_aber_aware_dff_synth.py --config "$1" \
    --workdir "$2" --total-epochs $TOTAL --epochs-per-chunk $TOTAL \
    --time-budget 480 --lr "$BEST" --validate-every 3
  sleep $COOL
}

AB_WD=results/dff_synth_r4/aif_ab
TH_WD=results/dff_synth_r4/aif_thin
mkdir -p "$AB_WD" "$TH_WD"
for i in $(seq 1 30); do
  ab=$(ep_of $AB_WD); th=$(ep_of $TH_WD)
  echo "=== [r4-aif] $(date +%T) round $i: ab=$ab/$TOTAL thin=$th/$TOTAL ==="
  [ "$ab" -ge $TOTAL ] && [ "$th" -ge $TOTAL ] && break
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "=== [r4-aif] deadline ==="; break; }
  [ "$ab" -lt $TOTAL ] && chunk configs/aber_aware_dff_synth.yml $AB_WD
  [ "$(date +%s)" -ge "$DEADLINE" ] && { echo "=== [r4-aif] deadline ==="; break; }
  [ "$th" -lt $TOTAL ] && chunk configs/aber_aware_dff_synth_thinlens.yml $TH_WD
done

eval_cell() {  # workdir tag valdir
  local wd=$1 tag=$2 valdir=$3
  rm -f "$wd/eval_final.json"
  for attempt in 1 2; do
    echo "=== [r4-aif] $(date +%T) eval $tag attempt $attempt ==="
    timeout 2400 python scripts/3_aber_aware_dff_synth.py --workdir "$wd" \
      --eval-only best --val-dir "$valdir"
    if [ -f "$wd/eval_final.json" ]; then
      # Stamp the cell's actual epoch count into the published artifact: the
      # *aif60 tag names the 60-epoch operating point, but a deadline break
      # above can leave a cell mid-training (r4 first pass: ab=28, thin=31),
      # and an unstamped copy would assert a budget the checkpoint never had.
      python - "$wd" "$OUT/$tag.json" <<'PYEOF'
import json, sys
wd, out = sys.argv[1], sys.argv[2]
d = json.load(open(f"{wd}/eval_final.json"))
try:
    d["trained_epochs"] = json.load(open(f"{wd}/progress.json"))["epoch"]
except Exception:
    d["trained_epochs"] = None
json.dump(d, open(out, "w"), indent=1)
PYEOF
      echo "wrote $OUT/$tag.json"; sleep $COOL; return 0
    fi
    sleep $COOL
  done
  echo "=== [r4-aif] eval $tag FAILED ===" >&2
}

eval_cell $AB_WD r4_test_eval_aif60  "$TEST"
eval_cell $TH_WD r4_test_eval_aif60_thin "$TEST"
eval_cell $AB_WD r4_retex_eval_aif60 "$RETEX"
eval_cell $TH_WD r4_retex_eval_aif60_thin "$RETEX"
echo "=== [r4-aif] ALL DONE $(date +%T) (ab=$(ep_of $AB_WD) thin=$(ep_of $TH_WD)) ==="
