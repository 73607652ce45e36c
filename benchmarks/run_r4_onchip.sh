#!/usr/bin/env bash
# Round-4 on-chip measurement queue (run when the axon TPU relay is up).
#
# Runs SERIALLY on purpose: killed/timed-out TPU processes leave remote
# compile jobs running server-side and new requests queue behind them for
# many minutes (CLAUDE.md) — never stack compiles.  Each step is
# independently resumable; re-running a completed step just refreshes its
# artifact.  From the repo root:  bash benchmarks/run_r4_onchip.sh
set -u  # NOT -e: a failed step should not block the later ones
cd "$(dirname "$0")/.."
mkdir -p artifacts

probe() {
  timeout 120 python - <<'EOF'
import jax
assert any(d.platform != "cpu" for d in jax.devices()), "no TPU"
print("TPU up:", jax.devices())
EOF
}

echo "=== 0. tunnel probe"
probe || { echo "TPU relay down — aborting"; exit 1; }

echo "=== 1. flagship headline (bench.py, one JSON line)"
timeout 3600 python bench.py | tee artifacts/bench_r4_headline.json

echo "=== 2. perf-artifact grid -> benchmarks/grid_results_r4.jsonl"
echo "    (headline + batch12/16 revisit + flash comparison + bank sweep)"
timeout 14400 python benchmarks/capture_r4.py

echo "=== 3. TPU-only suite (validates the FPS seed-clamp + fused programs"
echo "    on the compiled path) -> artifacts/tpu_suite_r4.log"
CMDIAD_TEST_ON_TPU=1 timeout 7200 python -m pytest \
  tests/test_point_ops.py tests/test_tpu_only.py -q \
  | tee artifacts/tpu_suite_r4.log

echo "=== 4. system throughput, cache ON, twice (second run = warm compile"
echo "    service; fit <100 s target; hbm_peak + fused single-dispatch eval)"
CMDIAD_SYS_CACHE=1 timeout 3600 python benchmarks/system_throughput.py \
  benchmarks/system_throughput.json
CMDIAD_SYS_CACHE=1 timeout 3600 python benchmarks/system_throughput.py \
  benchmarks/system_throughput.json

echo "=== 5. 2-class production run_detection -> system_multiclass.json"
CMDIAD_SYS_CLASSES=2 CMDIAD_SYS_CACHE=1 timeout 7200 \
  python benchmarks/system_throughput.py benchmarks/system_multiclass.json

echo "=== DONE — update BASELINE.md 'Artifact status' to point at:"
echo "    benchmarks/grid_results_r4.jsonl  artifacts/tpu_suite_r4.log"
echo "    benchmarks/system_throughput.json benchmarks/system_multiclass.json"
