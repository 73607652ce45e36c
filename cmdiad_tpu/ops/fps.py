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
  * ``_fps_single_jnp``    — lax.scan reference implementation (any backend);
  * ``_fps_single_pallas`` — single-program Pallas TPU kernel that keeps the
    point coordinates and the running min-distance vector resident in VMEM
    for all G iterations (no HBM round-trips inside the sequential loop).
    All per-iteration state updates are full-width VPU vector ops (one-hot
    selects) — no dynamic scalar loads/stores.
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
    """pts (3, P) f32 in VMEM (coords on sublanes, points on lanes) plus a
    sublane-aligned (P, 8) row copy for O(1) dynamic coordinate fetch of the
    selected point — one distance pass + one argmax per iteration.

    The seed (first valid point in scan order, pointnet2 semantics) is
    derived in-kernel from the init min-dist vector (invalid lanes are -1),
    keeping all inputs VMEM so the call is trivially vmappable.
    """
    lane_g = lax.broadcasted_iota(jnp.int32, (1, num_samples), 1)
    mind0 = mind_in_ref[0, :]
    mind_scratch[0, :] = mind0
    idx_ref[0, :] = jnp.zeros((num_samples,), jnp.int32)
    # (Pallas argmax only lowers for f32 operands)
    start = jnp.argmax((mind0 >= 0.0).astype(jnp.float32)).astype(jnp.int32)

    def body(i, last_idx):
        # record the point selected at step i (one-hot vector write)
        idx_ref[0, :] = jnp.where(lane_g[0] == i, last_idx, idx_ref[0, :])
        row = rows_ref[pl.ds(last_idx, 1), :]                 # (1, 8)
        d = ((pts_ref[0, :] - row[0, 0]) ** 2
             + (pts_ref[1, :] - row[0, 1]) ** 2
             + (pts_ref[2, :] - row[0, 2]) ** 2)
        prev = mind_scratch[0, :]
        new = jnp.where(prev >= 0.0, jnp.minimum(prev, d), prev)
        mind_scratch[0, :] = new
        return jnp.argmax(new).astype(jnp.int32)

    lax.fori_loop(0, num_samples, body, start)


def _fps_single_pallas(points: jnp.ndarray, mask: jnp.ndarray, num_samples: int):
    P = points.shape[0]
    pts_t = points.astype(jnp.float32).T                          # (3, P)
    rows = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, 5)))  # (P, 8)
    init_min = jnp.where(mask, jnp.float32(1e10), jnp.float32(-1.0))[None, :]

    idxs = pl.pallas_call(
        functools.partial(_fps_pallas_kernel, num_samples),
        out_shape=jax.ShapeDtypeStruct((1, num_samples), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),   # pts (3, P)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # rows (P, 8)
            pl.BlockSpec(memory_space=pltpu.VMEM),   # init min-dist (1, P)
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, P), jnp.float32)],
        interpret=jax.default_backend() != "tpu",
    )(pts_t, rows, init_min)
    return idxs[0]


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
    single = _fps_single_pallas if use_pallas else _fps_single_jnp
    idxs = jax.vmap(lambda p, m: single(p, m, num_samples))(points, mask)
    centers = jnp.take_along_axis(
        points.astype(jnp.float32), idxs[..., None], axis=1)
    return centers, idxs
