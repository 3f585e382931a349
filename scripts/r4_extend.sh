#!/bin/bash
# Round-4 tail part 2: extend the AiF convergence campaign to the full 60
# epochs once the perf session (scripts/r4_autopilot.sh) has released the
# single-tenant chip.
#
# The first campaign pass hit its wall-clock deadline at ab=28/60 and
# thin=31/60 epochs with train L1 still falling (0.90 -> 0.83 over the last
# validated block), so the 60-epoch budget accounting in RESULTS_DFF.md is
# not yet measured at its own operating point.  This waits for the autopilot
# to finish, then:
#   1) re-runs scripts/r4_aif_campaign.sh with a fresh deadline — the LR
#      sweep short-circuits (probes already at epoch 6) and both cells resume
#      from their committed chunk state, alternating to 60/60;
#   2) re-runs the four held-out evals (the campaign script does this
#      unconditionally) and the summarizer, then commits the refreshed
#      r4_aif60* artifacts;
#   3) runs the full test suite on the freed CPU (never concurrent with a
#      TPU job — single host core) and logs the result.
# Log: /tmp/r4_extend.log.  usage: nohup bash scripts/r4_extend.sh <autopilot_pid> &
set -u
cd /root/repo

AUTOPILOT_PID=${1:?usage: r4_extend.sh <autopilot_pid>}
echo "=== [extend] $(date +%T) waiting for autopilot pid $AUTOPILOT_PID ==="
while kill -0 "$AUTOPILOT_PID" 2>/dev/null; do
  sleep 60
done
echo "=== [extend] $(date +%T) autopilot gone; settling ==="
sleep 180

export R4_DEADLINE_TS=$(( $(date +%s) + 9000 ))
echo "=== [extend] $(date +%T) campaign extension, deadline in 9000s ==="
bash scripts/r4_aif_campaign.sh 2>&1 | tee -a /tmp/r4_campaign.log

python scripts/summarize_r4_aif.py
for f in docs/results_dff/r4_aif60* \
         docs/results_dff/r4_test_eval_aif60*.json \
         docs/results_dff/r4_retex_eval_aif60*.json \
         results/dff_synth_r4/*/progress.json; do
  [ -e "$f" ] && git add "$f"
done
git commit -q -m "r4 AiF campaign extension: both cells to 60/60 epochs, refreshed held-out evals" \
  || echo "[extend] nothing to commit for campaign extension"

echo "=== [extend] $(date +%T) full test suite ==="
timeout 5400 python -m pytest tests/ -x -q 2>&1 | tail -20 | tee /tmp/r4_pytest_tail.log
echo "=== [extend] ALL DONE $(date +%T) ==="
