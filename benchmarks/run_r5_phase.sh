#!/usr/bin/env bash
# Round-5 phase-attribution refresh under the SHIPPED scoring modes.
# The BASELINE.md "where the time goes" table predates the int8 kernel and
# the round-3/4/5 scoring-tail work; this re-captures the per-stage
# isolated device times for both kernel modes, serially (never stack TPU
# compiles — CLAUDE.md), at the headline config (65536 bank, batch 8, bf16).
set -u
cd "$(dirname "$0")/.."

echo "=== A. bf16 kernel (dist_method_s=l2) -> benchmarks/phase_breakdown_b8.json"
timeout 3600 python benchmarks/phase_breakdown.py 65536 8 bfloat16 l2

echo "=== B. int8 kernel (dist_method_s=l2_int8) -> benchmarks/phase_breakdown_b8_int8.json"
timeout 3600 python benchmarks/phase_breakdown.py 65536 8 bfloat16 l2_int8

echo "=== DONE"
