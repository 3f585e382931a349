#!/bin/bash
# Chunked DFF training driver for the tunnelled TPU (see
# .claude/skills/verify/SKILL.md: processes wedge after ~12-14 min, so each
# chunk exits CLEANLY via --time-budget and a fresh process resumes from the
# checkpoint; the persistent compile cache makes restarts compile-free).
#
# usage: scripts/run_chunked.sh <train_script> <config> <workdir> [total_epochs] [extra train args...]
set -u
SCRIPT=$1; CONFIG=$2; WORKDIR=$3; TOTAL=${4:-20}
shift $(( $# > 4 ? 4 : $# ))
cd "$(dirname "$0")/.."

for i in $(seq 1 40); do
  ep=$(python -c "import json; print(json.load(open('$WORKDIR/progress.json'))['epoch'])" 2>/dev/null || echo 0)
  if [ "$ep" -ge "$TOTAL" ]; then echo "[run_chunked] done at epoch $ep"; exit 0; fi
  echo "[run_chunked] chunk $i starting at epoch $ep"
  # timeout is a backstop only; --time-budget exits cleanly well before it.
  # Budget for the worst case: relay startup wedge (6-18 min, verify
  # SKILL.md) + the 480 s post-first-step budget + one final epoch — the
  # budget clock is re-anchored at the first completed step, so 1100 s
  # would SIGTERM-kill exactly the wedged-startup runs the clean
  # --time-budget exit exists to protect (a SIGTERM'd client tends to
  # wedge the next one's backend init).
  timeout 2100 python "$SCRIPT" --config "$CONFIG" --workdir "$WORKDIR" \
    --total-epochs "$TOTAL" --epochs-per-chunk "$TOTAL" --time-budget 480 "$@"
  rc=$?
  [ $rc -eq 124 ] || [ $rc -eq 143 ] && echo "[run_chunked] chunk killed (wedge?)"
  sleep 120  # cooldown: back-to-back TPU clients wedge at backend init
done
echo "[run_chunked] chunk budget exhausted before epoch $TOTAL" >&2
exit 1
