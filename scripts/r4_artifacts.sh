#!/bin/bash
# Round-4 perf-artifact refresh (VERDICT r3 #3, #4, #5), serialized for the
# single-tenant TPU with cooldowns between clients (verify SKILL.md):
#  1) one-session three-way stack A/B: per-frame fused (lax.map) vs the
#     whole-stack kernel (all-arbitrary grid) vs the same with spatial dims
#     marked "parallel" -> docs/kernel_sweep.jsonl (replaces the UNRELIABLE
#     2026-08-19 frameloop entry's role with a clean same-link comparison)
#  2) benchmark_suite.py -> BENCH_SUITE.json with the unified device/wall
#     split (the committed artifact predates the slope method)
#  3) psf_gate --full on BOTH shipped PSFNet checkpoints -> PSF_GATE.json
#     records at the reference's 20 foc x 40 z lattice
#  4) profile_train_step.py -> docs/train_step_profile.jsonl (render / fwd /
#     bwd / opt decomposition of the real DFF train step, both models)
# Run in background; log under /tmp/r4_artifacts.log.
set -u
cd /root/repo
COOL=180

step() {
  echo "=== [r4-artifacts] $(date +%T) $* ==="
  timeout 2700 "$@"
  echo "=== [r4-artifacts] $(date +%T) rc=$? ==="
  sleep $COOL
}

step python scripts/bench_fused_kernel.py \
  fused-f32-32x128 fusedstack-f32-32x128 fusedstackpp-f32-32x128
step python scripts/benchmark_suite.py
step python scripts/psf_gate.py ckpt/rf50mm/psfnet_480x640_ks11.msgpack --full
step python scripts/psf_gate.py ckpt/rf50mm/psfnet_480x640_ks11_ours100k.msgpack --full
step python scripts/profile_train_step.py aif
step python scripts/profile_train_step.py dfv
echo "=== [r4-artifacts] ALL DONE $(date +%T) ==="
