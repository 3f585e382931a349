#!/bin/bash
# Round-5 serial chip supervisor — strictly one TPU job at a time.
#
#   1) AiF campaign to 60/60 (r4_aif_campaign.sh resumes the committed chunk
#      state; its LR sweep short-circuits at 6/6 epochs) + 4 held-out evals
#      + summarize + commit                      (VERDICT r5-next #2)
#   2) bf16-trunk quality A/B: two same-seed cells (f32 vs --bf16) at the
#      real operating point, 12 epochs on a 12-epoch cosine, val every 3
#                                                (VERDICT r5-next #6)
#   3) K-steps-per-dispatch wall-clock A/B: k0 vs k8, 3 epochs each, fresh
#      workdirs, no validation — wall steps/s from epochs 2-3
#                                                (VERDICT r5-next #7)
#   4) taller-tile x bf16 whole-stack kernel probe + interleaved suite
#      refresh (scripts/r4_kernel_probe.sh)      (VERDICT r5-next #4)
#
# The full test suite and the final bench.py run are NOT here: the suite
# needs the host CPU free (single core), and the bench should run on the
# final tree.  Log: /tmp/r5_supervisor.log.
# usage: nohup bash scripts/r5_supervisor.sh > /tmp/r5_supervisor.log 2>&1 &
set -u
cd /root/repo
COOL=150

echo "=== [r5] $(date +%T) phase 1: campaign to 60/60 ==="
export R4_DEADLINE_TS=$(( $(date +%s) + 13500 ))
bash scripts/r4_aif_campaign.sh 2>&1 | tee -a /tmp/r5_campaign.log
python scripts/summarize_r4_aif.py
for f in docs/results_dff/r4_aif60* \
         docs/results_dff/r4_test_eval_aif60*.json \
         docs/results_dff/r4_retex_eval_aif60*.json \
         results/dff_synth_r4/*/progress.json; do
  [ -e "$f" ] && git add "$f"
done
git commit -q -m "AiF campaign completed to 60/60: refreshed metrics + held-out evals

No-Verification-Needed: training-campaign artifacts only" \
  || echo "[r5] nothing to commit for campaign"
sleep $COOL

echo "=== [r5] $(date +%T) phase 2: bf16 trunk quality A/B ==="
for cell in f32 bf16; do
  WD=results/r5_bf16_ab/$cell
  mkdir -p "$WD"
  EXTRA=""
  [ "$cell" = bf16 ] && EXTRA="--bf16"
  for i in 1 2 3 4; do
    ep=$(python -c "import json; print(json.load(open('$WD/progress.json'))['epoch'])" 2>/dev/null || echo 0)
    [ "$ep" -ge 12 ] && break
    echo "[r5-bf16ab] cell=$cell chunk $i from epoch $ep"
    timeout 2100 python scripts/3_aber_aware_dff_synth.py \
      --workdir "$WD" --total-epochs 12 --epochs-per-chunk 12 \
      --time-budget 480 --validate-every 3 $EXTRA
    sleep $COOL
  done
done
python scripts/summarize_bf16_ab.py && git add docs/bf16_ab.json results/r5_bf16_ab/*/train_log.jsonl results/r5_bf16_ab/*/metrics.jsonl 2>/dev/null
git commit -q -m "bf16-trunk quality A/B: same-seed f32 vs bf16 cells, 12 epochs each

No-Verification-Needed: measurement artifacts only" \
  || echo "[r5] nothing to commit for bf16 A/B"
sleep $COOL

echo "=== [r5] $(date +%T) phase 3: K-steps-per-dispatch wall-clock A/B ==="
for k in 0 8; do
  WD=results/r5_kstep/k$k
  rm -rf "$WD"; mkdir -p "$WD"
  timeout 2100 python scripts/3_aber_aware_dff_synth.py \
    --workdir "$WD" --total-epochs 3 --epochs-per-chunk 3 \
    --time-budget 1200 --validate-every 10 --k-per-dispatch $k
  sleep $COOL
done
python - <<'EOF'
import json
out = {}
for k in (0, 8):
    recs = [json.loads(l) for l in open(f"results/r5_kstep/k{k}/train_log.jsonl")]
    # epoch 1 includes compile + backend startup; rate from epochs 2-3
    tail = [r for r in recs if r["epoch"] >= 2]
    steps = sum(r["steps"] for r in tail)
    sec = sum(r["sec"] for r in tail)
    out[f"k{k}"] = {"wall_steps_per_s": round(steps / sec, 3),
                    "epochs": [r["epoch"] for r in tail],
                    "steps": steps, "sec": sec}
json.dump(out, open("docs/kstep_ab.json", "w"), indent=1)
print("kstep A/B:", out)
EOF
git add docs/kstep_ab.json 2>/dev/null
git commit -q -m "K-steps-per-dispatch wall-clock A/B at the reference operating point

No-Verification-Needed: measurement artifacts only" \
  || echo "[r5] nothing to commit for kstep A/B"
sleep $COOL

echo "=== [r5] $(date +%T) phase 4: kernel probe + suite refresh ==="
bash scripts/r4_kernel_probe.sh 2>&1 | tee /tmp/r5_kernel_probe.log
for f in docs/kernel_sweep.jsonl BENCH_SUITE.json; do
  [ -e "$f" ] && git add "$f"
done
git commit -q -m "Taller-tile x bf16 whole-stack kernel probe; interleaved suite refresh

No-Verification-Needed: measurement artifacts only" \
  || echo "[r5] nothing to commit for kernel probe"
echo "=== [r5] ALL DONE $(date +%T) ==="
