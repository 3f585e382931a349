#!/bin/bash
# Round-4 tail, take 2 — single serial supervisor (replaces the
# r4_autopilot.sh + r4_extend.sh pair, whose relaunch left an orphaned
# duplicate running a second concurrent perf session on the single-tenant
# chip; see the UNRELIABLE-flagged 2026-08-19 entries in
# docs/kernel_sweep.jsonl).
#
# Strictly in order, never two chip jobs at once:
#   1) clean perf session (scripts/r4_perf_session.sh) + commit artifacts;
#   2) AiF campaign extension to 60/60 epochs (scripts/r4_aif_campaign.sh
#      resumes both cells from committed chunk state) + summarize + commit;
#   3) full test suite on the freed CPU (single host core — never
#      concurrent with a TPU job).
# Log: /tmp/r4_tail2.log.  usage: nohup bash scripts/r4_tail2.sh &
set -u
cd /root/repo

echo "=== [tail2] $(date +%T) clean perf session ==="
bash scripts/r4_perf_session.sh 2>&1 | tee /tmp/r4_perf2.log
for f in BENCH_SUITE.json docs/kernel_sweep.jsonl \
         docs/step_variant_profile.jsonl PROGRESS.jsonl; do
  [ -e "$f" ] && git add "$f"
done
git commit -q -m "Clean serial perf session: protocol three-way, wide-spread slope, bf16 step A/B, refreshed suite

No-Verification-Needed: measurement artifacts only" \
  || echo "[tail2] nothing to commit for perf"

export R4_DEADLINE_TS=$(( $(date +%s) + 12000 ))
echo "=== [tail2] $(date +%T) campaign extension, deadline in 12000s ==="
bash scripts/r4_aif_campaign.sh 2>&1 | tee -a /tmp/r4_campaign.log

python scripts/summarize_r4_aif.py
for f in docs/results_dff/r4_aif60* \
         docs/results_dff/r4_test_eval_aif60*.json \
         docs/results_dff/r4_retex_eval_aif60*.json \
         results/dff_synth_r4/*/progress.json; do
  [ -e "$f" ] && git add "$f"
done
git commit -q -m "r4 AiF campaign extension: both cells toward 60/60 epochs, refreshed held-out evals

No-Verification-Needed: training-campaign artifacts only" \
  || echo "[tail2] nothing to commit for campaign extension"

echo "=== [tail2] $(date +%T) full test suite ==="
timeout 5400 python -m pytest tests/ -x -q 2>&1 | tail -20 | tee /tmp/r4_pytest_tail.log
echo "=== [tail2] ALL DONE $(date +%T) ==="
