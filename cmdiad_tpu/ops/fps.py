"""Masked farthest point sampling.

Replaces ``pointnet2_ops.furthest_point_sample`` (CUDA ext used at
/root/reference/models/models.py:70-78).  Semantics matched to the pointnet2
kernel on the reference's zero-filtered point list:

  * seeding from the first valid point in scan order (pointnet2 seeds index 0
    of the filtered array);
  * squared-L2 farthest-first selection with a running min-distance vector;
  * masked (padded) points can never be selected — they hold a negative
    running distance for the argmax.

Two implementations:
  * ``_fps_single_jnp``     — lax.scan reference implementation (any backend);
  * ``_fps_batched_pallas`` — Pallas TPU kernel, one grid program per batch
    instance, that keeps the point coordinates and the running min-distance
    vector resident in VMEM for all G iterations (no HBM round-trips inside
    the sequential loop).  All per-iteration state updates are full-width
    VPU vector ops (one-hot selects) — no dynamic scalar loads/stores.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cmdiad_tpu.ops.masked import first_valid_index


def _fps_single_jnp(points: jnp.ndarray, mask: jnp.ndarray, num_samples: int):
    """FPS for one unbatched point set. points (P,3), mask (P,) bool."""
    p = points.astype(jnp.float32)
    start = first_valid_index(mask).astype(jnp.int32)
    # Running min squared distance to the selected set; invalid points sit at
    # -1 so argmax never picks them while any valid candidate remains.
    init_min = jnp.where(mask, jnp.float32(1e10), jnp.float32(-1.0))

    def body(carry, _):
        min_d, last_idx = carry
        last = p[last_idx]
        d = jnp.sum((p - last[None, :]) ** 2, axis=-1)
        min_d = jnp.where(min_d >= 0.0, jnp.minimum(min_d, d), min_d)
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        return (min_d, nxt), last_idx

    _, idxs = lax.scan(body, (init_min, start), None, length=num_samples)
    return idxs.astype(jnp.int32)


def _fps_pallas_kernel(num_samples, pts_ref, rows_ref, mind_in_ref,
                       idx_ref, mind_scratch):
    """One grid program per batch instance (blocks carry a leading size-1
    batch dim).  Per-point state lives in FULL (S, 128) tiles — S = P/128
    sublanes — not single-sublane (1, P) vectors: a (1, P) f32 vector
    occupies P/128 vregs at 1/8 utilisation, so every elementwise pass over
    it costs 8x the vector ops of the packed layout (element (s, l) is
    point s*128 + l).  pts is 3 such planes (coords outermost); a
    sublane-aligned (P, 8) row copy gives O(1) dynamic coordinate fetch of
    the selected point.

    The farthest selection is max-then-min-over-index-where-equal (two
    packed passes) instead of Mosaic argmax: same cost class, and —
    unlike Mosaic's argmax, whose tie-break is ARBITRARY (measured: ties at
    lanes {3,100,200} returned 100; its tree reduction visits lanes out of
    order) — it deterministically picks the FIRST point at the max, on
    every backend.  That makes the seed (first valid point in scan order,
    pointnet2 semantics) and every in-loop tie reproducible.

    Batching via the grid instead of vmap keeps VMEM at one instance's
    footprint: vmapping a whole-array-block pallas_call stages EVERY
    instance's operands in VMEM at once and OOMs its 16 MB scoped limit at
    batch >= 4 with 32k-point sets.
    """
    lane_g = lax.broadcasted_iota(jnp.int32, (1, num_samples), 1)
    s_tiles = mind_in_ref.shape[2]
    p_total = s_tiles * 128
    # flat point index of element (s, l) = s*128 + l
    flat_idx = (lax.broadcasted_iota(jnp.int32, (s_tiles, 128), 0) * 128
                + lax.broadcasted_iota(jnp.int32, (s_tiles, 128), 1))
    mind0 = mind_in_ref[0, 0]                                  # (S, 128)
    mind_scratch[:, :] = mind0
    idx_ref[0, 0, :] = jnp.zeros((num_samples,), jnp.int32)
    # p_total sentinel = "no valid point"; map an all-invalid sample to
    # seed 0 (exactly the jnp path's argmax-of-all-false result) —
    # otherwise the pl.ds row fetch below reads past the (P, 8) block on
    # the compiled path (unchecked OOB; interpret mode clamps — divergent).
    # NB: clamping to p_total-1 is NOT safe: p_total = ceil(P/128)*128 can
    # exceed the rows block's true capacity P.
    min_flat = jnp.min(jnp.where(mind0 >= 0.0, flat_idx, jnp.int32(p_total)))
    start = jnp.where(min_flat == jnp.int32(p_total), jnp.int32(0), min_flat)

    def body(i, last_idx):
        # record the point selected at step i (one-hot vector write)
        idx_ref[0, 0, :] = jnp.where(lane_g[0] == i, last_idx, idx_ref[0, 0, :])
        row = rows_ref[0, pl.ds(last_idx, 1), :]              # (1, 8)
        d = ((pts_ref[0, 0] - row[0, 0]) ** 2
             + (pts_ref[0, 1] - row[0, 1]) ** 2
             + (pts_ref[0, 2] - row[0, 2]) ** 2)              # (S, 128)
        prev = mind_scratch[:, :]
        new = jnp.where(prev >= 0.0, jnp.minimum(prev, d), prev)
        mind_scratch[:, :] = new
        far = jnp.max(new)
        return jnp.min(jnp.where(new == far, flat_idx,
                                 jnp.int32(p_total))).astype(jnp.int32)

    lax.fori_loop(0, num_samples, body, start)


def _fps_batched_pallas(points: jnp.ndarray, mask: jnp.ndarray,
                        num_samples: int):
    """points (B, P, 3), mask (B, P) -> (B, G) int32, one grid step per
    batch instance (VMEM holds a single instance at a time).  The point
    capacity is padded to a 128 multiple for the packed tiles (production
    sets are pow2-capacity already; padded slots carry the invalid -1
    sentinel so they can never be selected)."""
    B, P, _ = points.shape
    pad = (-P) % 128
    s_tiles = (P + pad) // 128
    pts_t = (jnp.pad(points.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
             .transpose(0, 2, 1).reshape(B, 3, s_tiles, 128))  # (B, 3, S, 128)
    rows = jnp.pad(points.astype(jnp.float32),
                   ((0, 0), (0, 0), (0, 5)))                      # (B, P, 8)
    init_min = jnp.pad(
        jnp.where(mask, jnp.float32(1e10), jnp.float32(-1.0)),
        ((0, 0), (0, pad)), constant_values=-1.0).reshape(
            B, 1, s_tiles, 128)                               # (B, 1, S, 128)

    idxs = pl.pallas_call(
        functools.partial(_fps_pallas_kernel, num_samples),
        grid=(B,),
        out_shape=jax.ShapeDtypeStruct((B, 1, num_samples), jnp.int32),
        in_specs=[
            pl.BlockSpec((1, 3, s_tiles, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # pts (1, 3, S, 128)
            pl.BlockSpec((1, P, 8), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),   # rows (1, P, 8)
            pl.BlockSpec((1, 1, s_tiles, 128), lambda b: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),   # init min-dist
        ],
        out_specs=pl.BlockSpec((1, 1, num_samples), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((s_tiles, 128), jnp.float32)],
        # Mosaic's default scoped-VMEM budget is 16 MiB — far below the
        # 128 MiB physical VMEM of a v5e core.  The compiler reports ~8 MiB
        # of scoped stack per in-flight instance at P=32768 (raw operand
        # bytes are ~2.5 MiB; layout padding and pipeline buffers make up
        # the rest), so batch >= 4 needs the real budget.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(pts_t, rows, init_min)
    return idxs[:, 0, :]


@functools.partial(jax.jit, static_argnames=("num_samples", "use_pallas"))
def farthest_point_sample(points: jnp.ndarray, mask: jnp.ndarray,
                          num_samples: int, use_pallas: bool = True):
    """Batched masked FPS.

    Args:
      points: (B, P, 3) padded point sets.
      mask:   (B, P) validity (see ops.masked.nonzero_point_mask).
      num_samples: number of centers G.
      use_pallas: route through the Pallas kernel (interpreted off-TPU).
    Returns:
      centers (B, G, 3) float32, center_idx (B, G) int32.
    """
    if use_pallas:
        idxs = _fps_batched_pallas(points, mask, num_samples)
    else:
        idxs = jax.vmap(
            lambda p, m: _fps_single_jnp(p, m, num_samples))(points, mask)
    centers = jnp.take_along_axis(
        points.astype(jnp.float32), idxs[..., None], axis=1)
    return centers, idxs
