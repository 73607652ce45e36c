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
    n_warmup, n_timed = 3, 20

    rgb = jnp.asarray(rng.normal(size=(batch, 224, 224, 3)).astype(np.float32))
    pc = rng.normal(size=(batch, 224, 224, 3)).astype(np.float32) * 0.05
    yy, xx = np.mgrid[0:224, 0:224]
    pc[:, ((yy - 112) ** 2 + (xx - 112) ** 2) > 90 ** 2] = 0.0
    pc = jnp.asarray(pc)
    rgb_bank = jnp.asarray(rng.normal(size=(8192, 768)).astype(np.float32))
    xyz_bank = jnp.asarray(rng.normal(size=(8192, 768)).astype(np.float32))

    @jax.jit
    def infer(params, rgb, pc, rgb_bank, xyz_bank):
        rgb_patch, _ = backbone.rgb_patches(params, rgb)
        out = backbone.xyz_patches(params, pc)
        results = []
        for i in range(batch):
            s_r, m_r = patchcore_score(rgb_patch[i], rgb_bank, (28, 28))
            s_x, m_x = patchcore_score(out["xyz_patch"][i], xyz_bank, (56, 56))
            results.append((0.1 * s_r + s_x, 0.1 * m_r + m_x))
        s = jnp.stack([r[0] for r in results])
        m = jnp.stack([r[1] for r in results])
        return s, m

    for _ in range(n_warmup):
        s, m = infer(params, rgb, pc, rgb_bank, xyz_bank)
    m.block_until_ready()

    t0 = time.perf_counter()
    for _ in range(n_timed):
        s, m = infer(params, rgb, pc, rgb_bank, xyz_bank)
    m.block_until_ready()
    dt = time.perf_counter() - t0
    images_per_sec = n_timed * batch / dt

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
