#!/bin/bash
# Round-4 tail autopilot: survives interactive-session loss.
#
# Waits for the running AiF convergence campaign (scripts/r4_aif_campaign.sh)
# to finish, then in order:
#   1) summarizes the campaign (scripts/summarize_r4_aif.py) and commits the
#      docs/results_dff/r4_aif60* artifacts;
#   2) runs the post-campaign perf session (scripts/r4_perf_session.sh) on
#      the freed single-tenant chip;
#   3) commits the refreshed perf artifacts (BENCH_SUITE.json,
#      docs/kernel_sweep.jsonl, docs/step_variant_profile.jsonl).
# Log: /tmp/r4_autopilot.log.  usage: nohup bash scripts/r4_autopilot.sh &
set -u
cd /root/repo

CAMPAIGN_PID=${1:?usage: r4_autopilot.sh <campaign_pid>}
echo "=== [autopilot] $(date +%T) waiting for campaign pid $CAMPAIGN_PID ==="
while kill -0 "$CAMPAIGN_PID" 2>/dev/null; do
  sleep 60
done
echo "=== [autopilot] $(date +%T) campaign gone; settling ==="
sleep 120

python scripts/summarize_r4_aif.py
for f in docs/results_dff/r4_aif60* \
         docs/results_dff/r4_test_eval_aif60*.json \
         docs/results_dff/r4_retex_eval_aif60*.json; do
  [ -e "$f" ] && git add "$f"
done
git commit -q -m "r4 AiF 60-epoch campaign: final artifacts + held-out evals" \
  || echo "[autopilot] nothing to commit for campaign"

bash scripts/r4_perf_session.sh 2>&1 | tee /tmp/r4_perf.log

for f in BENCH_SUITE.json docs/kernel_sweep.jsonl \
         docs/step_variant_profile.jsonl; do
  [ -e "$f" ] && git add "$f"
done
git commit -q -m "Post-campaign perf session: protocol three-way, wide-spread slope, bf16 step A/B, refreshed suite" \
  || echo "[autopilot] nothing to commit for perf"
echo "=== [autopilot] ALL DONE $(date +%T) ==="
