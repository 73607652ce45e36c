"""Round-4 perf-artifact capture (VERDICT r3 next-steps #5 and #6).

Re-records, as committed JSONL, every flagship number BASELINE.md cites in
prose: the headline config, the flash-attention comparison, and the batch
12/16 revisit after the round-3 splat-dtype + fused-pooling fixes removed
the tensors blamed for the batch-16 HBM regression.

Each config appends one JSON line to benchmarks/grid_results_r4.jsonl
(incremental — a partial sweep still records what it measured; re-runs
append, the analysis takes the latest line per config tag).

Usage: python benchmarks/capture_r4.py
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

V5E_BF16_PEAK_TFLOPS = 197.0

# (tag, measure kwargs) — headline first so a truncated run still records it
CONFIGS = [
    ("headline",       dict(bank_rows=65536, batch=8, dtype="bfloat16")),
    ("batch12",        dict(bank_rows=65536, batch=12, dtype="bfloat16")),
    ("batch16",        dict(bank_rows=65536, batch=16, dtype="bfloat16")),
    ("flash_bf16",     dict(bank_rows=65536, batch=8, dtype="bfloat16",
                            use_flash=True)),
    ("flash_f32",      dict(bank_rows=65536, batch=8, dtype="float32",
                            use_flash=True)),
    ("plain_f32",      dict(bank_rows=65536, batch=8, dtype="float32")),
    ("small_bank",     dict(bank_rows=8192, batch=8, dtype="bfloat16")),
    ("largest_class",  dict(bank_rows=163840, batch=8, dtype="bfloat16")),
    ("batch1",         dict(bank_rows=65536, batch=1, dtype="bfloat16")),
]


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "grid_results_r4.jsonl")
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    for tag, kw in CONFIGS:
        if only and tag not in only:
            continue
        print(f"[r4] {tag}: {kw} ...", flush=True)
        t0 = time.time()
        try:
            res = bench.measure(chain=8, repeats=3, **kw)
        except Exception:
            print(f"[r4] {tag} FAILED:\n{traceback.format_exc()}", flush=True)
            res = {"error": traceback.format_exc(limit=1), **kw}
        else:
            if res.get("tflops_per_sec"):
                res["mfu_vs_bf16_peak"] = round(
                    res["tflops_per_sec"] / V5E_BF16_PEAK_TFLOPS, 3)
            print(f"[r4] {tag} -> {res['images_per_sec']:.1f} img/s "
                  f"({res['ms_per_image']:.2f} ms/img) "
                  f"wall {time.time() - t0:.0f}s", flush=True)
        res["tag"] = tag
        res["use_flash"] = bool(kw.get("use_flash", False))
        res["ts"] = time.time()
        with open(out_path, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
