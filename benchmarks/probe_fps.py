"""Isolated FPS-kernel throughput probe.

BASELINE.md's round-3 FPS-repack claim (1.058 -> 0.962 ms/img isolated at
the production shape) lost its JSONL artifact to the relay outage that
ended round 3; this probe re-captures the isolated number for the SHIPPED
kernel so the claim has a committed artifact.  Workload = the production
grouping shape: batch 8, 32 768 padded points (disk-masked like
bench.py's fixture), 1024 centers — the `farthest_point_sample` call
inside `point_mae.group_points` (models/point_mae.py:71), replacing the
reference's pointnet2_ops CUDA FPS (models/models.py:70-78).

Same chained-readback methodology as bench.py (the relay's
block_until_ready is unreliable; every input perturbed per iteration so
XLA cannot hoist the body).  Writes benchmarks/probe_fps.json.

Usage: python benchmarks/probe_fps.py [batch] [points] [centers]
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_pts = int(sys.argv[2]) if len(sys.argv) > 2 else 32768
    n_ctr = int(sys.argv[3]) if len(sys.argv) > 3 else 1024

    import jax
    import jax.numpy as jnp
    from jax import lax
    from cmdiad_tpu.ops.fps import farthest_point_sample
    from cmdiad_tpu.ops.masked import host_compact_points

    rng = np.random.default_rng(0)
    pc = rng.normal(size=(batch, 224, 224, 3)).astype(np.float32) * 0.05
    yy, xx = np.mgrid[0:224, 0:224]
    pc[:, ((yy - 112) ** 2 + (xx - 112) ** 2) > 90 ** 2] = 0.0
    pts = jnp.asarray(np.stack(
        [host_compact_points(pc[i], n_pts) for i in range(batch)]))
    use_pallas = jax.default_backend() == "tpu"

    chain = 8

    @jax.jit
    def chained(pts):
        def body(_, carry):
            eps = carry * 1e-30
            p = pts + eps * (pts != 0)  # keep padding exactly zero
            mask = jnp.any(p != 0, axis=-1)
            centers, idx = farthest_point_sample(
                p, mask, n_ctr, use_pallas=use_pallas)
            return jnp.sum(centers) + 1e-9 * jnp.sum(idx)
        return lax.fori_loop(0, chain, body, jnp.float32(0.0))

    t0 = time.perf_counter()
    float(chained(pts))
    compile_s = time.perf_counter() - t0
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(chained(pts))
        best = min(best, time.perf_counter() - t0)
    ms_img = 1e3 * best / (chain * batch)

    out = {"batch": batch, "points": n_pts, "centers": n_ctr,
           "backend": jax.default_backend(), "use_pallas": use_pallas,
           "ms_per_image": round(ms_img, 3),
           "compile_s": round(compile_s, 1), "ts": time.time()}
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_fps.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
