"""Flagship workload grid: bank x batch x dtype throughput sweep.

Runs bench.measure over the production workload envelope (VERDICT.md round-1
item 2) and appends one JSON line per config to benchmarks/grid_results.jsonl
(incremental, so a partial sweep still records everything it measured).

Bank sizes (xyz rows; rgb bank = rows/4, bucket-padded like production):
  8192    round-1 legacy workload (tiny-class regime)
  65536   ~210-train-sample class (0.1 x N x 3136 post-coreset)
  163840  largest-class regime (500 samples -> 156.8k true rows, padded)
The >=32768 rows exercise the fused streaming Pallas kernel
(ops/pallas_scoring.py) that the round-1 benchmark never touched.

Usage: python benchmarks/bench_grid.py [--quick]
  --quick: batch {1, 8} x dtype {fp32, bf16} x bank {8192, 65536} only.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

# v5e peak: 197 TFLOP/s bf16 (fp32 matmuls lower through bf16x3 passes at
# roughly 1/4-1/2 rate; MFU is reported against the bf16 peak for both)
V5E_BF16_PEAK_TFLOPS = 197.0

BANKS_FULL = (8192, 65536, 163840)
BATCHES_FULL = (1, 4, 8)
DTYPES = ("float32", "bfloat16")


def main():
    quick = "--quick" in sys.argv
    banks = (8192, 65536) if quick else BANKS_FULL
    batches = (1, 8) if quick else BATCHES_FULL

    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "grid_results.jsonl")
    results = []
    for dtype in DTYPES:
        for bank in banks:
            for batch in batches:
                tag = f"bank={bank} batch={batch} dtype={dtype}"
                print(f"[grid] {tag} ...", flush=True)
                t0 = time.time()
                try:
                    res = bench.measure(bank_rows=bank, batch=batch,
                                        dtype=dtype, chain=8)
                except Exception:
                    print(f"[grid] {tag} FAILED:\n{traceback.format_exc()}",
                          flush=True)
                    res = {"bank_rows": bank, "batch": batch, "dtype": dtype,
                           "error": traceback.format_exc(limit=1)}
                else:
                    if res.get("tflops_per_sec"):
                        res["mfu_vs_bf16_peak"] = round(
                            res["tflops_per_sec"] / V5E_BF16_PEAK_TFLOPS, 3)
                    print(f"[grid] {tag} -> "
                          f"{res['images_per_sec']:.1f} img/s "
                          f"({res['ms_per_image']:.2f} ms/img) "
                          f"wall {time.time() - t0:.0f}s", flush=True)
                res["ts"] = time.time()
                results.append(res)
                with open(out_path, "a") as f:
                    f.write(json.dumps(res) + "\n")

    ok = [r for r in results if "error" not in r]
    if ok:
        print("\n| bank | batch | dtype | img/s | ms/img | TFLOP/s | MFU |")
        print("|---|---|---|---|---|---|---|")
        for r in ok:
            print(f"| {r['bank_rows']} | {r['batch']} | {r['dtype']} | "
                  f"{r['images_per_sec']:.1f} | {r['ms_per_image']:.2f} | "
                  f"{r.get('tflops_per_sec', '-')} | "
                  f"{r.get('mfu_vs_bf16_peak', '-')} |")


if __name__ == "__main__":
    main()
