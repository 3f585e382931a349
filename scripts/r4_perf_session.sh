#!/bin/bash
# Round-4 post-campaign perf session — run ONLY when the chip is free
# (after scripts/r4_aif_campaign.sh finishes; single-tenant TPU).
#
# One stable-link session that settles every open measurement question:
#  1) render protocol three-way: the production entry (prodstack) under the
#     kernel A/B's K-slope (8->24), the same entry under bench.py's S-slope
#     points (10->30), and the raw fusedstackpp kernel — isolates protocol
#     vs path effects behind the 2.54 vs 1.76 ms/frame disagreement, now
#     with per-run slope_spread_pct reliability tags;
#  2) a wide-spread slope (8->48) of the production entry — 3x the time
#     delta of either protocol, the most jitter-robust single number;
#  3) bf16 vs f32 AiF train-step A/B (profile_step_variants) — fills the
#     dangling "bf16 compute dtype (below)" measurement in DESIGN.md §9;
#  4) fresh bench.py + benchmark_suite.py artifacts;
#  5) the /verify surfaces (__graft_entry__.py).
# Results append to docs/kernel_sweep.jsonl / docs/step_variant_profile.jsonl
# and overwrite BENCH_SUITE.json; logs to /tmp/r4_perf.log.
set -u
cd /root/repo
COOL=150

run() {  # label cmd...
  local label=$1; shift
  echo "=== [perf] $(date +%T) $label ==="
  timeout 2100 "$@"
  echo "=== [perf] $(date +%T) $label done (rc=$?) ==="
  sleep $COOL
}

run "A/B prodstack+raw @K8-24" \
  python scripts/bench_fused_kernel.py prodstack-f32 fusedstackpp-f32-32x128
run "A/B prodstack @S10-30 (bench.py points)" \
  env AADFF_K1=10 AADFF_K2=30 python scripts/bench_fused_kernel.py prodstack-f32
run "A/B prodstack @S8-48 (wide spread)" \
  env AADFF_K1=8 AADFF_K2=48 python scripts/bench_fused_kernel.py prodstack-f32
run "f32 train-step (same-session control)" \
  env AADFF_VARIANTS=full_step python scripts/profile_step_variants.py
run "bf16 train-step A/B" \
  env AADFF_BF16=1 AADFF_VARIANTS=full_step python scripts/profile_step_variants.py
run "bench.py" python bench.py
run "benchmark_suite" python scripts/benchmark_suite.py
run "graft entry + dryrun" python __graft_entry__.py
echo "=== [perf] ALL DONE $(date +%T) ==="
