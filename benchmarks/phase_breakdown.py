"""Per-phase device-time breakdown of the flagship inference pipeline.

VERDICT.md round-1 item 8 asked where the ms/img actually goes.  The axon
remote-tunnel backend cannot serve a jax.profiler device trace (the profiler
needs a local TPU runtime; we still try and note the outcome), so each stage
is measured with the same chained-readback methodology as bench.py:

  rgb       ViT-B/8 forward + 28^2/56^2 patch assembly
  xyz       FPS/KNN grouping + Point-MAE + 3-NN interpolation + splat pooling
  score_xyz 3136-patch PatchCore scoring vs the xyz bank (+ eq.7 + blur)
  score_rgb 784-patch PatchCore scoring vs the rgb bank (+ eq.7 + blur)
  blur      bilinear 224^2 upsample + PIL-parity Gaussian blur alone

Stage times are measured in isolation, so their sum slightly exceeds the
fused full-pipeline time (XLA overlaps/fuses across stages there).

Usage: python benchmarks/phase_breakdown.py [bank_rows] [batch] [dtype] [metric]
`metric` (default "l2") also accepts "l2_int8" — the round-5 shipped bench
default — so the attribution table can be refreshed for the int8 scoring
mode.  Writes benchmarks/phase_breakdown_b{batch}[_int8].json and prints a
table.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chained_time(fn, args, chain=8, repeats=2, perturb_idx=(0,)):
    """Best-of-N seconds per call of fn(*args), RPC-amortised via an
    in-program dependency chain with fold-proof (carry*1e-30) perturbation
    of the inputs listed in perturb_idx."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @jax.jit
    def chained(*args):
        def body(_, carry):
            eps = carry * 1e-30
            pert = [a + eps if i in perturb_idx else a
                    for i, a in enumerate(args)]
            return fn(*pert)
        return lax.fori_loop(0, chain, body, jnp.float32(0.0))

    float(chained(*args))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chained(*args))
        best = min(best, time.perf_counter() - t0)
    return best / chain


def main():
    bank_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    dtype = sys.argv[3] if len(sys.argv) > 3 else "bfloat16"
    metric = sys.argv[4] if len(sys.argv) > 4 else "l2"

    import jax
    import jax.numpy as jnp
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.ops.masked import host_compact_points
    from cmdiad_tpu.ops.scoring import patchcore_score
    from cmdiad_tpu.ops.blur import knn_gaussian_blur
    from cmdiad_tpu.ops.pooling import bilinear_resize

    backbone = DualBackbone(compute_dtype=dtype,
                            use_pallas=jax.default_backend() == "tpu")
    params = backbone.init_params(0)
    grid = backbone.vit_config.grid
    rng = np.random.default_rng(0)

    rgb = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)).astype(np.float32))
    pc = rng.normal(size=(batch, 224, 224, 3)).astype(np.float32) * 0.05
    yy, xx = np.mgrid[0:224, 0:224]
    pc[:, ((yy - 112) ** 2 + (xx - 112) ** 2) > 90 ** 2] = 0.0
    compact = jnp.asarray(np.stack(
        [host_compact_points(pc[i], 32768) for i in range(batch)]))
    pc = jnp.asarray(pc)
    rgb_bank = jnp.asarray(
        rng.normal(size=(max(8192, bank_rows // 4), 768)).astype(np.float32))
    xyz_bank = jnp.asarray(rng.normal(size=(bank_rows, 768)).astype(np.float32))
    rgb_patch = jnp.asarray(
        rng.normal(size=(batch, grid * grid, 768)).astype(np.float32))
    xyz_patch = jnp.asarray(
        rng.normal(size=(batch, 56 * 56, 768)).astype(np.float32))
    smap_small = jnp.asarray(
        rng.normal(size=(batch, 56, 56, 1)).astype(np.float32))

    phases = {}

    def t(name, fn, args, **kw):
        sec = chained_time(fn, args, **kw)
        phases[name] = 1e3 * sec / batch
        print(f"[phase] {name}: {phases[name]:.3f} ms/img", flush=True)

    t("rgb", lambda p_, x: jnp.sum(backbone.rgb_patches(p_, x)[0]) +
        jnp.sum(backbone.rgb_patches(p_, x)[1]) * 1e-9,
      (params, rgb), perturb_idx=(1,))
    t("xyz", lambda p_, x, c: jnp.sum(
        backbone.xyz_patches(p_, x, compact_pts=c)["xyz_patch"]),
      (params, pc, compact), perturb_idx=(1, 2))

    def score(patches, bank, hw):
        def one(p):
            s, m = patchcore_score(p, bank, hw, metric=metric)
            return s + 1e-9 * jnp.sum(m)
        return jnp.sum(jax.vmap(one)(patches))

    t("score_xyz", lambda p_, b: score(p_, b, (56, 56)),
      (xyz_patch, xyz_bank), perturb_idx=(0,))
    t("score_rgb", lambda p_, b: score(p_, b, (grid, grid)),
      (rgb_patch, rgb_bank), perturb_idx=(0,))
    t("blur", lambda m: jnp.sum(jax.vmap(
        lambda x: knn_gaussian_blur(
            bilinear_resize(x, (224, 224))[..., 0], 4.0))(m)),
      (smap_small,), perturb_idx=(0,))

    # full fused pipeline for the overlap comparison
    def full(p_, r, x, c):
        rp, _ = backbone.rgb_patches(p_, r)
        xp = backbone.xyz_patches(p_, x, compact_pts=c)["xyz_patch"]

        def one(a, b):
            s1, m1 = patchcore_score(a, rgb_bank, (grid, grid), metric=metric)
            s2, m2 = patchcore_score(b, xyz_bank, (56, 56), metric=metric)
            return s1 + s2 + 1e-9 * (jnp.sum(m1) + jnp.sum(m2))
        return jnp.sum(jax.vmap(one)(rp, xp))

    t("full_pipeline", full, (params, rgb, pc, compact), perturb_idx=(1, 2, 3))

    trace_note = "not attempted"
    if jax.default_backend() == "tpu":
        trace_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "trace")
        try:
            jax.profiler.start_trace(trace_dir)
            float(jax.jit(full)(params, rgb, pc, compact))
            jax.profiler.stop_trace()
            trace_note = f"captured to {trace_dir}"
        except Exception as e:  # remote tunnel backends can't serve traces
            trace_note = f"unavailable on this backend: {type(e).__name__}: {e}"
        print(f"[trace] {trace_note}", flush=True)

    out = {"bank_rows": bank_rows, "batch": batch, "dtype": dtype,
           "metric": metric, "backend": jax.default_backend(),
           "ms_per_image": {k: round(v, 3) for k, v in phases.items()},
           "profiler_trace": trace_note, "ts": time.time()}
    suffix = "" if metric == "l2" else f"_{metric.removeprefix('l2_')}"
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        f"phase_breakdown_b{batch}{suffix}.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["ms_per_image"]))


if __name__ == "__main__":
    main()
