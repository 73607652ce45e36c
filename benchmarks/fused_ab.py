"""Fused-eval A/B: measured warm system-eval throughput, fused ON vs OFF
(VERDICT r4 next-step #2 — replace BASELINE.md's "expected ~2x" with a
measured number or retract it).

One process, one fitted class, then ALTERNATING warm eval passes with
cfg.fused_eval toggled (same banks, same relay weather, both program sets
compiled before timing starts); >=3 repeats per arm, medians reported.
Warm-eval numbers behind the relay swing run-to-run (VERDICT r4 weak #6),
so the alternation + medians are the point — a fused-vs-staged gap must
survive interleaved sampling to be real.

Usage:  python benchmarks/fused_ab.py [out.json]
Env:    CMDIAD_AB_TRAIN (default 200), CMDIAD_AB_TEST (48),
        CMDIAD_AB_BATCH (8), CMDIAD_AB_REPEATS (4),
        CMDIAD_AB_CPU=1 + CMDIAD_AB_SIZE=64 for a CPU smoke run.
"""

import json
import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.data.synthetic import make_synthetic_dataset
    from cmdiad_tpu.methods.registry import build_backbone
    from cmdiad_tpu.runner import CMDIADRunner

    n_train = int(os.environ.get("CMDIAD_AB_TRAIN", "200"))
    n_test = int(os.environ.get("CMDIAD_AB_TEST", "48"))
    batch = int(os.environ.get("CMDIAD_AB_BATCH", "8"))
    repeats = int(os.environ.get("CMDIAD_AB_REPEATS", "4"))
    size = int(os.environ.get("CMDIAD_AB_SIZE", "224"))
    if os.environ.get("CMDIAD_AB_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")

    cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "cmdiad_jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    tmp = tempfile.mkdtemp(prefix="cmdiad_ab_")
    n_good = n_test // 2
    n_blotch = (n_test - n_good) // 2
    n_dent = n_test - n_good - n_blotch
    root = make_synthetic_dataset(
        tmp, size=size, n_train=n_train, n_test_good=n_good,
        n_test_bad=n_dent, n_test_color=n_blotch)

    kwargs = dict(dataset_path=root, method_name="DINO+Point_MAE",
                  batch_size=batch, compute_dtype="bfloat16",
                  f_coreset=0.1, max_sample=500, cache_train_features=True,
                  rgb_size=size, xyz_size=size, gt_size=size)
    if size != 224:
        kwargs.update(rgb_backbone_name="tiny", xyz_backbone_name="tiny",
                      num_group=32, group_size=16, use_pallas=False,
                      f_coreset=0.5)
    cfg = Config(**kwargs)

    backbone = build_backbone(cfg)
    runner = CMDIADRunner(cfg, backbone=backbone,
                          params=backbone.init_params(0))
    t0 = time.perf_counter()
    runner.fit("widget")
    fit_s = time.perf_counter() - t0

    # pre-decoded test samples isolate the dispatch question from host IO:
    # the streamed arm includes per-batch tiff/png decode (the production
    # loader path), the preloaded arm is pure dispatch+device+D2H
    from cmdiad_tpu.runner import preload_class_samples
    pre = preload_class_samples(cfg, "widget")["test"]

    def eval_pass(preloaded):
        runner.method.reset_predictions()
        metrics = runner.evaluate("widget",
                                  test_samples=pre if preloaded else None)
        return runner.timings["eval_s"], metrics

    # compile/warm BOTH program sets before any timed pass
    base_metrics = {}
    for fused in (True, False):
        runner.method.cfg = cfg.replace(fused_eval=fused)
        _, base_metrics[fused] = eval_pass(False)
    # fused vs staged results are rounding-level equal (tested in
    # test_e2e); the metric check here guards against a silent fallback
    for k, v in base_metrics[True].items():
        assert abs(v - base_metrics[False][k]) < 1e-3, (k, base_metrics)

    times = {(f, p): [] for f in (True, False) for p in (True, False)}
    for rep in range(repeats):
        for preloaded in (False, True):
            for fused in (True, False):
                runner.method.cfg = cfg.replace(fused_eval=fused)
                t, _ = eval_pass(preloaded)
                times[(fused, preloaded)].append(round(t, 3))
                print(f"# rep {rep} fused={fused} preloaded={preloaded}: "
                      f"{t:.3f}s ({n_test / t:.2f} img/s)",
                      file=sys.stderr, flush=True)

    med = {k: statistics.median(v) for k, v in times.items()}
    out = {
        "backend": jax.default_backend(),
        "n_train": n_train, "n_test": n_test, "batch": batch, "size": size,
        "repeats": repeats,
        "fit_s": round(fit_s, 1),
        "eval_s_fused": times[(True, False)],
        "eval_s_staged": times[(False, False)],
        "eval_s_fused_preloaded": times[(True, True)],
        "eval_s_staged_preloaded": times[(False, True)],
        "median_eval_s_fused": med[(True, False)],
        "median_eval_s_staged": med[(False, False)],
        "median_eval_s_fused_preloaded": med[(True, True)],
        "median_eval_s_staged_preloaded": med[(False, True)],
        "median_img_per_s_fused": round(n_test / med[(True, False)], 2),
        "median_img_per_s_staged": round(n_test / med[(False, False)], 2),
        "median_img_per_s_fused_preloaded": round(
            n_test / med[(True, True)], 2),
        "median_img_per_s_staged_preloaded": round(
            n_test / med[(False, True)], 2),
        "fused_speedup": round(med[(False, False)] / med[(True, False)], 3),
        "fused_speedup_preloaded": round(
            med[(False, True)] / med[(True, True)], 3),
        "metrics": {k: round(v, 4) for k, v in base_metrics[True].items()},
    }
    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
