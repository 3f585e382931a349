#!/bin/bash
# Trimmed round-4 artifact queue (see scripts/r4_artifacts.sh for the full
# plan): serialized for the single-tenant TPU, deadline-guarded so the round
# ends with committed artifacts rather than a half-run step.
# usage: R4_DEADLINE_TS=<unix-s> bash scripts/r4_artifacts_run.sh
set -u
cd /root/repo
DEADLINE=${R4_DEADLINE_TS:-$(( $(date +%s) + 4800 ))}
COOL=150

step() {
  if [ "$(date +%s)" -ge "$DEADLINE" ]; then
    echo "=== [r4-artifacts] $(date +%T) DEADLINE — skipping: $*"
    return 0
  fi
  echo "=== [r4-artifacts] $(date +%T) START: $*"
  timeout 1800 "$@"
  echo "=== [r4-artifacts] $(date +%T) rc=$?"
  sleep $COOL
}

step python scripts/benchmark_suite.py
step python scripts/bench_fused_kernel.py \
  fused-f32-32x128 fusedstack-f32-32x128 fusedstackpp-f32-32x128
step python scripts/psf_gate.py ckpt/rf50mm/psfnet_480x640_ks11.msgpack --full
step python scripts/psf_gate.py ckpt/rf50mm/psfnet_480x640_ks11_ours100k.msgpack --full
step python scripts/profile_train_step.py aif
step python scripts/profile_train_step.py dfv
echo "=== [r4-artifacts] ALL DONE $(date +%T) ==="
