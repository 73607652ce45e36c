"""Flagship benchmark: dual-modal anomaly-detection inference throughput.

Measures steady-state images/sec of the full per-sample flagship pipeline on
one chip — ViT-B/8 RGB features + Point-MAE point features (masked FPS/KNN/
3-NN interpolation) + PatchCore scoring of both patch sets against 8192-row
memory banks + fused/blurred segmentation map — i.e. everything the
reference's eval loop does per test image (SURVEY.md §3.2) minus host IO.

The reference publishes no throughput number (BASELINE.md): ``vs_baseline``
is therefore measured against the first recorded value of this benchmark
(bench_baseline.json, written on first run) so the ratio tracks progress
across rounds.

Prints exactly one JSON line:
  {"metric": "...", "value": N, "unit": "images/sec/chip", "vs_baseline": N}
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from cmdiad_tpu.models.backbone import DualBackbone
    from cmdiad_tpu.ops.scoring import patchcore_score

    backbone = DualBackbone(use_pallas=jax.default_backend() == "tpu")
    params = backbone.init_params(0)
    rng = np.random.default_rng(0)

    batch = int(os.environ.get("CMDIAD_BENCH_BATCH", "1"))
    k_chain = int(os.environ.get("CMDIAD_BENCH_CHAIN", "16"))

    rgb = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)).astype(np.float32))
    pc = rng.normal(size=(batch, 224, 224, 3)).astype(np.float32) * 0.05
    yy, xx = np.mgrid[0:224, 0:224]
    pc[:, ((yy - 112) ** 2 + (xx - 112) ** 2) > 90 ** 2] = 0.0
    from cmdiad_tpu.ops.masked import host_compact_points
    compact = jnp.asarray(np.stack(
        [host_compact_points(pc[i], 32768) for i in range(batch)]))
    pc = jnp.asarray(pc)
    rgb_bank = jnp.asarray(rng.normal(size=(8192, 768)).astype(np.float32))
    xyz_bank = jnp.asarray(rng.normal(size=(8192, 768)).astype(np.float32))

    def infer_once(params, rgb, pc, compact, rgb_bank, xyz_bank):
        rgb_patch, _ = backbone.rgb_patches(params, rgb)
        out = backbone.xyz_patches(params, pc, compact_pts=compact)
        s = 0.0
        for i in range(batch):
            s_r, _ = patchcore_score(rgb_patch[i], rgb_bank, (28, 28))
            s_x, _ = patchcore_score(out["xyz_patch"][i], xyz_bank, (56, 56))
            s = s + 0.1 * s_r + s_x
        return s

    # Timing methodology: the remote-tunnel backend's block_until_ready does
    # not reliably wait and per-call RPC latency (~60 ms) would swamp device
    # time, so k_chain pipeline iterations are data-dependency-chained INSIDE
    # one jitted program and completion is proven by a host readback.
    import jax.lax as lax

    @jax.jit
    def chain(params, rgb, pc, compact, rgb_bank, xyz_bank):
        def body(_, carry):
            # perturb EVERY modality input so no branch is loop-invariant
            # (XLA would hoist it out of the timing loop)
            return infer_once(params, rgb + carry * 0.0, pc + carry * 0.0,
                              compact + carry * 0.0, rgb_bank, xyz_bank)
        return lax.fori_loop(0, k_chain, body, jnp.float32(0.0))

    float(chain(params, rgb, pc, compact, rgb_bank, xyz_bank))
    t0 = time.perf_counter()
    float(chain(params, rgb, pc, compact, rgb_bank, xyz_bank))
    dt = time.perf_counter() - t0
    images_per_sec = k_chain * batch / dt

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = images_per_sec
        with open(baseline_path, "w") as f:
            json.dump({"value": images_per_sec,
                       "note": "first recorded run (round 1); reference "
                               "publishes no throughput number"}, f)

    print(json.dumps({
        "metric": "flagship dual-modal AD inference throughput "
                  f"(batch={batch}, 8192-row banks, {jax.default_backend()})",
        "value": round(images_per_sec, 3),
        "unit": "images/sec/chip",
        "vs_baseline": round(images_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
