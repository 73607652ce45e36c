"""Round-5 perf-artifact capture (VERDICT r4 next-step #1: the int8
bank-scoring kernel measured END-TO-END).

Appends one JSON line per config to benchmarks/grid_results_r5.jsonl:
the l2 comparators re-measured in the SAME session as the l2_int8 runs so
the int8 delta is not polluted by relay weather between sessions, at the
headline (65k) and largest-class (163k) bank regimes, plus batch-16 under
int8 (the batch-16 no-go was HBM-pressure-bound; int8 halves the bank
kernel's MXU time, not its HBM, so this records whether the verdict moves).

Usage: python benchmarks/capture_r5.py [tag ...]
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

V5E_BF16_PEAK_TFLOPS = 197.0

# (tag, measure kwargs) — alternating comparator/int8 so each pair shares
# relay conditions; headline pair first so a truncated run still records it
CONFIGS = [
    ("headline_l2",    dict(bank_rows=65536, batch=8, dtype="bfloat16")),
    ("headline_int8",  dict(bank_rows=65536, batch=8, dtype="bfloat16",
                            metric="l2_int8")),
    ("largest_l2",     dict(bank_rows=163840, batch=8, dtype="bfloat16")),
    ("largest_int8",   dict(bank_rows=163840, batch=8, dtype="bfloat16",
                            metric="l2_int8")),
    ("batch16_int8",   dict(bank_rows=65536, batch=16, dtype="bfloat16",
                            metric="l2_int8")),
    # post-refinement re-measures (the *_refined tags run the same configs
    # through the round-5 exact-refinement kernel wrapper — argmin row
    # gathered and its distance recomputed exactly in f32,
    # ops/pallas_scoring._exact_refine; kwargs identical, code differs)
    ("headline_l2_refined",   dict(bank_rows=65536, batch=8,
                                   dtype="bfloat16")),
    ("headline_int8_refined", dict(bank_rows=65536, batch=8,
                                   dtype="bfloat16", metric="l2_int8")),
    ("largest_int8_refined",  dict(bank_rows=163840, batch=8,
                                   dtype="bfloat16", metric="l2_int8")),
]


def main():
    out_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "grid_results_r5.jsonl")
    only = [a for a in sys.argv[1:] if not a.startswith("-")]
    for tag, kw in CONFIGS:
        if only and tag not in only:
            continue
        print(f"[r5] {tag}: {kw} ...", flush=True)
        t0 = time.time()
        try:
            res = bench.measure(chain=8, repeats=3, **kw)
        except Exception:
            print(f"[r5] {tag} FAILED:\n{traceback.format_exc()}", flush=True)
            res = {"error": traceback.format_exc(limit=1), **kw}
        else:
            if res.get("tflops_per_sec"):
                res["mfu_vs_bf16_peak"] = round(
                    res["tflops_per_sec"] / V5E_BF16_PEAK_TFLOPS, 3)
            print(f"[r5] {tag} -> {res['images_per_sec']:.1f} img/s "
                  f"({res['ms_per_image']:.2f} ms/img) "
                  f"wall {time.time() - t0:.0f}s", flush=True)
        res["tag"] = tag
        res["metric"] = kw.get("metric", "l2")
        res["ts"] = time.time()
        with open(out_path, "a") as f:
            f.write(json.dumps(res) + "\n")


if __name__ == "__main__":
    main()
