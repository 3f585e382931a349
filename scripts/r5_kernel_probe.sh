#!/bin/bash
# Round-5 kernel probe (VERDICT r5-next #4), trimmed from r4_kernel_probe.sh:
# the taller-tile x bf16 whole-stack sweep + the interleaved BENCH_SUITE
# refresh.  The third r4 phase (production-entry wide slope) is dropped —
# round 5's bench.py already measures the production path with the
# interleaved k1=2/k2=8 fori_loop protocol (452.6 fps, spread 1.1%,
# 2026-08-20 run recorded in PARITY.md); re-measuring it here would just
# burn chip time.
# Run ONLY when the chip is otherwise free.
# usage: nohup bash scripts/r5_kernel_probe.sh > /tmp/r5_kernel_probe.log 2>&1 &
set -u
cd /root/repo

echo "=== [probe] $(date +%T) taller-tile / bf16 whole-stack sweep ==="
timeout 2400 env AADFF_SLOPE_REPS=12 AADFF_SLOPE_INTERLEAVE=1 python scripts/bench_fused_kernel.py \
  fusedstackpp-f32-32x128 fusedstackpp-bf16-32x128 \
  fusedstackpp-f32-48x128 fusedstackpp-bf16-48x128 \
  fusedstackpp-f32-96x128 fusedstackpp-bf16-96x128
echo "=== [probe] $(date +%T) sweep done (rc=$?) ==="
sleep 120

echo "=== [probe] $(date +%T) benchmark_suite, interleaved protocol ==="
timeout 2400 env AADFF_SLOPE_REPS=12 AADFF_SLOPE_INTERLEAVE=1 \
  python scripts/benchmark_suite.py
echo "=== [probe] ALL DONE $(date +%T) ==="
