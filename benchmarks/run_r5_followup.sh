#!/usr/bin/env bash
# Round-5 follow-up queue (serial; run AFTER run_r5_onchip.sh is done):
# the preloaded-arm fused A/B, the cold-process per-stage attribution
# probe, and a cold-fit re-run with the jitted coreset bucketing.
set -u
cd "$(dirname "$0")/.."
mkdir -p artifacts

echo "=== A. fused A/B with preloaded arms (isolates dispatch RPCs from"
echo "    host decode) -> benchmarks/fused_ab.json"
timeout 3600 python benchmarks/fused_ab.py benchmarks/fused_ab.json

echo "=== B. per-stage cold-process attribution of the coreset phase"
echo "    -> benchmarks/probe_finalize.json"
timeout 3600 python benchmarks/probe_finalize.py

echo "=== C. cold-process fit with the jitted coreset bucketing"
echo "    -> artifacts/r5_system_cold2.json"
CMDIAD_SYS_CACHE=1 timeout 7200 python benchmarks/system_throughput.py \
  artifacts/r5_system_cold2.json

echo "=== D. TPU-only suite re-run (fixed int8 bounds + chunked oracle)"
echo "    -> artifacts/tpu_suite_r5.log"
CMDIAD_TEST_ON_TPU=1 timeout 10800 python -m pytest \
  tests/test_point_ops.py tests/test_tpu_only.py -q \
  | tee artifacts/tpu_suite_r5.log

echo "=== E. headline refresh with the round-5 default (l2_int8 scoring)"
timeout 3600 python bench.py | tee artifacts/bench_r5_headline.json

echo "=== DONE"
