#!/bin/bash
# Round-4 kernel probe: the two whole-stack wins were never combined.
#   - fusedstackpp-f32-32x128 is production (1.76-1.88 ms/frame measured);
#   - explicit bf16 halves weight/activation VMEM, which is what caps tile
#     height — and tile height was the big lever (2.54 -> 1.91 ms/frame
#     going th 8 -> 32 in the per-frame sweep, docs/DESIGN.md section 4).
# Probe taller tiles in both dtypes, plus the bf16 32-row control, with the
# interleaved higher-rep slope protocol (AADFF_SLOPE_REPS) for tighter
# spread.  Run ONLY when the chip is free (after scripts/r4_tail2.sh).
# usage: nohup bash scripts/r4_kernel_probe.sh > /tmp/r4_kernel_probe.log 2>&1 &
set -u
cd /root/repo

echo "=== [probe] $(date +%T) taller-tile / bf16 whole-stack sweep ==="
timeout 2400 env AADFF_SLOPE_REPS=12 AADFF_SLOPE_INTERLEAVE=1 python scripts/bench_fused_kernel.py \
  fusedstackpp-f32-32x128 fusedstackpp-bf16-32x128 \
  fusedstackpp-f32-48x128 fusedstackpp-bf16-48x128 \
  fusedstackpp-f32-96x128 fusedstackpp-bf16-96x128
echo "=== [probe] $(date +%T) sweep done (rc=$?) ==="
sleep 150

echo "=== [probe] $(date +%T) production entry, high-rep wide slope ==="
timeout 2400 env AADFF_SLOPE_REPS=12 AADFF_SLOPE_INTERLEAVE=1 AADFF_K1=8 AADFF_K2=48 \
  python scripts/bench_fused_kernel.py prodstack-f32
echo "=== [probe] $(date +%T) prod slope done (rc=$?) ==="
sleep 150

# The 2026-08-19 tail2 BENCH_SUITE render number hit slope_rate's
# noise-inversion fallback (spread null, 199 fps vs bench.py's 420 the same
# session): 5 blocked reps lost the 20-frame work delta to an RTT transient.
# Re-measure the suite under the interleaved high-rep protocol.
echo "=== [probe] $(date +%T) benchmark_suite, interleaved protocol ==="
timeout 2400 env AADFF_SLOPE_REPS=12 AADFF_SLOPE_INTERLEAVE=1 \
  python scripts/benchmark_suite.py
echo "=== [probe] ALL DONE $(date +%T) ==="
