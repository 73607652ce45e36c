#!/usr/bin/env bash
# Round-5 on-chip measurement queue (run when the axon TPU relay is up).
#
# Runs SERIALLY on purpose: killed/timed-out TPU processes leave remote
# compile jobs running server-side and new requests queue behind them for
# many minutes (CLAUDE.md) — never stack compiles.  Each step is
# independently resumable.  Step 1 (the cold-process fit measurement) MUST
# run first: every later step warms the compile service with overlapping
# programs.  From the repo root:
#   bash benchmarks/run_r5_onchip.sh [start_step]
set -u  # NOT -e: a failed step should not block the later ones
cd "$(dirname "$0")/.."
mkdir -p artifacts
START="${1:-0}"

probe() {
  timeout 120 python - <<'EOF'
import jax
assert any(d.platform != "cpu" for d in jax.devices()), "no TPU"
print("TPU up:", jax.devices())
EOF
}

step() { [ "$1" -ge "$START" ]; }

echo "=== 0. tunnel probe"
probe || { echo "TPU relay down — aborting"; exit 1; }

if step 1; then
echo "=== 1. cold-process fit (VERDICT r5 #3/#4): run A = first process of"
echo "    the session (cold programs), incl. an in-process warm refit"
echo "    (fit_s_warm); run B = second fresh process ->"
echo "    artifacts/r5_system_cold.json + benchmarks/system_throughput.json"
CMDIAD_SYS_CACHE=1 timeout 7200 python benchmarks/system_throughput.py \
  artifacts/r5_system_cold.json
CMDIAD_SYS_CACHE=1 timeout 7200 python benchmarks/system_throughput.py \
  benchmarks/system_throughput.json
fi

if step 2; then
echo "=== 2. fused on/off A/B (VERDICT r5 #2): alternating warm eval"
echo "    passes, medians -> benchmarks/fused_ab.json"
timeout 3600 python benchmarks/fused_ab.py benchmarks/fused_ab.json
fi

if step 3; then
echo "=== 3. 10-class production run_detection (VERDICT r5 #5) ->"
echo "    benchmarks/system_multiclass.json + markdown mean tables under"
echo "    artifacts/r5_multiclass_results/"
mkdir -p artifacts/r5_multiclass_results
CMDIAD_SYS_CLASSES=10 CMDIAD_SYS_CACHE=1 \
  CMDIAD_SYS_RESULTS_DIR=artifacts/r5_multiclass_results timeout 14400 \
  python benchmarks/system_throughput.py benchmarks/system_multiclass.json
fi

if step 4; then
echo "=== 4. int8 grid (VERDICT r5 #1): l2 vs l2_int8 pairs, same session"
echo "    -> benchmarks/grid_results_r5.jsonl"
timeout 7200 python benchmarks/capture_r5.py
fi

if step 5; then
echo "=== 5. TPU-only suite (int8 end-metric delta + image-signal fixture"
echo "    + kernel/fused coverage) -> artifacts/tpu_suite_r5.log"
CMDIAD_TEST_ON_TPU=1 timeout 10800 python -m pytest \
  tests/test_point_ops.py tests/test_tpu_only.py -q \
  | tee artifacts/tpu_suite_r5.log
fi

if step 6; then
echo "=== 6. headline refresh (bench.py, one JSON line)"
timeout 3600 python bench.py | tee artifacts/bench_r5_headline.json
fi

echo "=== DONE"
