#!/bin/bash
# Round-4 system-path re-capture AFTER the interp negative-distance clamp
# (commit 9e4d007) + the seg-fuser row cap (01593f2): the pre-fix numbers
# carried good-image score blowups (chance-level image AUROC) and a ~65 s
# sklearn seg-fuser fit inside late fusion.  Serial on purpose — parallel
# TPU jobs stack remote compiles (CLAUDE.md).
set -u
cd "$(dirname "$0")/.."
LOG=artifacts/r4_system_refresh.log
{
  echo "=== A. single-class system bench, cache ON (run 1: fresh programs)"
  CMDIAD_SYS_CACHE=1 timeout 3000 python benchmarks/system_throughput.py \
      benchmarks/system_throughput.json
  echo "=== B. single-class again (warm compile service)"
  CMDIAD_SYS_CACHE=1 timeout 3000 python benchmarks/system_throughput.py \
      benchmarks/system_throughput.json
  echo "=== C. 2-class production run_detection"
  CMDIAD_SYS_CACHE=1 CMDIAD_SYS_CLASSES=2 timeout 3000 python \
      benchmarks/system_throughput.py benchmarks/system_multiclass.json
  echo "=== DONE"
} >"$LOG" 2>&1
