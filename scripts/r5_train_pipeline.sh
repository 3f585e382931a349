#!/bin/bash
# Round-5 serial training pipeline — strictly one TPU job at a time.
#   1) bf16-trunk quality A/B twin (VERDICT r5-next #6): 12 epochs of the
#      campaign ab cell's exact recipe (seed 126, lr=1e-4 cosine over 60,
#      val every 3, k=8 dispatch) with AiFDepthNet(dtype=bfloat16).  The
#      f32 control is the campaign cell itself (epochs <= 12), so the
#      control costs no extra chip time (scripts/summarize_bf16_ab.py).
#   2) the 60/60 campaign rerun + held-out evals (scripts/r5_campaign.sh,
#      VERDICT r5-next #2).
# usage: nohup bash scripts/r5_train_pipeline.sh > /tmp/r5_train.log 2>&1 &
set -u
cd /root/repo

echo "=== [r5-pipe] $(date +%T) phase 1: bf16 twin (12 epochs) ==="
WD=results/r5_bf16_ab/bf16
mkdir -p "$WD"
for i in 1 2 3; do
  ep=$(python -c "import json; print(json.load(open('$WD/progress.json'))['epoch'])" 2>/dev/null || echo 0)
  [ "$ep" -ge 12 ] && break
  echo "[r5-pipe] bf16 twin chunk $i from epoch $ep"
  timeout 2100 python scripts/3_aber_aware_dff_synth.py \
    --workdir "$WD" --total-epochs 60 --epochs-per-chunk 12 \
    --time-budget 900 --validate-every 3 --lr 1e-4 \
    --k-per-dispatch 8 --bf16
  sleep 90
done

echo "=== [r5-pipe] $(date +%T) phase 2: 60/60 campaign ==="
# train deadline leaves room for the 4 held-out evals + the full test
# suite (CPU, must not overlap TPU work) before the round closes
R5_COOL=90 R5_KDISP=8 R5_DEADLINE_TS=${R5_DEADLINE_TS:-1787214300} \
  bash scripts/r5_campaign.sh
echo "=== [r5-pipe] $(date +%T) phase 3: bf16 A/B summary ==="
python scripts/summarize_bf16_ab.py || echo "[r5-pipe] bf16 summary failed"
echo "=== [r5-pipe] ALL DONE $(date +%T) ==="
