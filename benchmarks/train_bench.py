"""MTFI distillation training-step throughput on the TPU.

Complements bench.py (inference) with the training side of the framework:
steady-state optimizer steps/sec and samples/sec for the three distillation
architectures (FtoF MLP, FtoF conv, ItoF HRNet), measured with the same
chained-readback methodology (the step is folded into a lax.fori_loop with
the batch perturbed by carry*1e-30, so the ~60 ms/dispatch tunnel RPC
amortises away).  Optionally captures a jax.profiler device trace of one
step per method.

Synthetic arrays at production shapes (the feature dumps are (N, 3136,
2*768) fusion patches / (224, 224, 3) images — data/feature_store.py).

Usage: python benchmarks/train_bench.py [--trace]
Writes benchmarks/train_bench.json.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_method(tm: str, batch: int, dtype: str, trace: bool):
    import jax
    import jax.numpy as jnp
    import optax
    from jax import lax
    from cmdiad_tpu.config import TrainConfig
    from cmdiad_tpu.train.distill import build_train_setup

    cfg = TrainConfig(train_method=tm, compute_dtype=dtype, blr=0.002)
    net, init_args, loss_fn, keys = build_train_setup(cfg)
    rng = np.random.default_rng(0)
    batch_arrays = {}
    for key in keys:
        if key == "patch":
            batch_arrays[key] = rng.normal(
                size=(batch, 3136, 2 * 768)).astype(np.float32)
        elif key == "feature":
            batch_arrays[key] = rng.normal(
                size=(batch, 3136, 768)).astype(np.float32)
        elif key in ("target", "image"):
            batch_arrays[key] = rng.normal(
                size=(batch, 224, 224, 3)).astype(np.float32)
    batch_dev = {k: jnp.asarray(v) for k, v in batch_arrays.items()}

    variables = net.init(jax.random.PRNGKey(0), *init_args)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(1e-4)
    opt_state = tx.init(params)

    def one_step(params, batch_stats, opt_state, b):
        def lf(p):
            v = {"params": p}
            if batch_stats:
                v["batch_stats"] = batch_stats
            return loss_fn(v, b, True)
        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_stats = aux.pop("batch_stats", batch_stats)
        return params, new_stats, opt_state, loss

    chain = 8

    @jax.jit
    def chained(params, batch_stats, opt_state, b):
        def body(_, carry):
            p, s, o, tok = carry
            bp = {k: v + tok * 1e-30 for k, v in b.items()}
            p, s, o, loss = one_step(p, s, o, bp)
            return p, s, o, loss.astype(jnp.float32)
        out = lax.fori_loop(0, chain, body,
                            (params, batch_stats, opt_state,
                             jnp.float32(0.0)))
        return out[3]

    float(chained(params, batch_stats, opt_state, batch_dev))  # compile+warm
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        float(chained(params, batch_stats, opt_state, batch_dev))
        best = min(best, time.perf_counter() - t0)
    res = {"train_method": tm, "batch": batch, "dtype": dtype,
           "steps_per_sec": round(chain / best, 2),
           "samples_per_sec": round(chain * batch / best, 1),
           "ms_per_step": round(1e3 * best / chain, 2)}
    print(f"[train] {tm} b{batch} {dtype}: {res['steps_per_sec']} steps/s "
          f"({res['samples_per_sec']} samples/s)", flush=True)

    if trace and jax.default_backend() == "tpu":
        tdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "trace_train")
        try:
            jax.profiler.start_trace(tdir)
            float(chained(params, batch_stats, opt_state, batch_dev))
            jax.profiler.stop_trace()
            res["trace"] = tdir
        except Exception as e:
            res["trace"] = f"unavailable: {e}"
    return res


def main():
    trace = "--trace" in sys.argv
    rows = [
        bench_method("HallucinationCrossModality", 16, "float32", trace),
        bench_method("HallucinationCrossModality", 16, "bfloat16", False),
        bench_method("HallucinationCrossModalityConv", 16, "float32", False),
        bench_method("HallucinationCrossModalityConv", 16, "bfloat16", False),
        bench_method("RGBInputToXYZFeatureHRNET", 16, "float32", False),
        bench_method("RGBInputToXYZFeatureHRNET", 16, "bfloat16", False),
    ]
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "train_bench.json")
    with open(path, "w") as f:
        json.dump({"rows": rows, "ts": time.time()}, f, indent=1)
    print(json.dumps(rows))


if __name__ == "__main__":
    main()
