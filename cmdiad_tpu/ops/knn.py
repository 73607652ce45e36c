"""Masked k-nearest-neighbour grouping.

Replaces ``KNN_CUDA`` (used at /root/reference/models/models.py:86,100): for
each of G center points, the k nearest points among the full (masked) point
set, indices sorted ascending by distance.  On TPU this is one MXU matmul
(the -2*x·y term of the squared distance) plus a top-k — no custom kernel
needed; XLA's sort-based top_k over the lane axis is fast at these sizes
(G=1024, P≈50k, k=128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from cmdiad_tpu.ops.masked import BIG_DIST


def pairwise_sqdist(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances  (..., N, C) x (..., M, C) -> (..., N, M).

    Clamped to >= 0: the dot-product identity cancels catastrophically for
    (near-)coincident pairs — and every FPS group center IS one of the
    input points — so d can come out ~-1e-7, which flips downstream
    1/(d+eps) IDW weights to huge NEGATIVE values (non-convex combinations
    that blew interpolated features up 300x; measured, see
    ops/pallas_interp.py).  The reference's pointnet2 three_nn computes
    per-coordinate differences and is non-negative by construction."""
    a2 = jnp.sum(a * a, axis=-1)[..., :, None]
    b2 = jnp.sum(b * b, axis=-1)[..., None, :]
    ab = jnp.einsum("...nc,...mc->...nm", a, b, preferred_element_type=jnp.float32)
    return jnp.maximum(a2 + b2 - 2.0 * ab, 0.0)


@functools.partial(jax.jit, static_argnames=("k", "method"))
def masked_knn(points: jnp.ndarray, mask: jnp.ndarray,
               centers: jnp.ndarray, k: int, method: str = "auto"):
    """k-NN of each center among the valid points.

    Args:
      points:  (B, P, 3) padded point sets.
      mask:    (B, P) validity.
      centers: (B, G, 3) query points.
      k: neighbours per center.
      method: 'exact' (lax.top_k full sort), 'approx'
        (lax.approx_max_k — TPU partial-reduction top-k), or 'auto'
        (approx on TPU, exact elsewhere).
    Returns:
      idx (B, G, k) int32 — ascending by distance (ties by lower index),
      matching KNN_CUDA's transpose_mode=True output ordering.

    TPU note: lax.top_k with k=128 over ~50k lanes lowers to a full sort
    whose compilation/runtime are pathological on v5e; approx_max_k's tiled
    partial reduction is ~1000x faster.  The downstream consumer (the
    Point-MAE group encoder) max-pools over the neighbourhood, so occasional
    boundary-rank swaps in the neighbour *set* are inconsequential — the
    recall target is 0.95 (~0.977 measured at these shapes; higher targets
    inflate the aggregation pass cost ~7x).
    """
    if method == "auto":
        method = "approx" if jax.default_backend() == "tpu" else "exact"
    if method == "approx" and points.shape[0] > 1:
        # Batched (3-D) approx_max_k lowers ~3x slower per image than the
        # 2-D per-sample form (measured 1.64 vs 0.53 ms/img at B=8,
        # G=1024, P=32768 inside the fused pipeline), so scan the batch
        # with lax.map and keep distances + masking inside the body where
        # they fuse into the reduction pass.
        def one(args):
            c1, p1, m1 = args
            d1 = pairwise_sqdist(c1, p1)
            d1 = jnp.where(m1[None, :], d1, BIG_DIST)
            # recall 0.95 requested => ~0.977 measured at these shapes;
            # higher targets inflate the aggregation pass cost ~7x
            return lax.approx_max_k(-d1, k, recall_target=0.95,
                                    aggregate_to_topk=True)
        neg, idx = lax.map(one, (centers.astype(jnp.float32),
                                 points.astype(jnp.float32), mask))
    else:
        d = pairwise_sqdist(centers.astype(jnp.float32),
                            points.astype(jnp.float32))
        d = jnp.where(mask[:, None, :], d, BIG_DIST)
        if method == "approx":
            neg, idx = lax.approx_max_k(-d, k, recall_target=0.95,
                                        aggregate_to_topk=True)
        else:
            neg, idx = lax.top_k(-d, k)
    # Samples with fewer than k valid points would otherwise return masked
    # indices in the tail (their distance is BIG_DIST); substitute the first
    # valid point so downstream gathers never touch padding — mirrors FPS's
    # repeat-when-exhausted semantics.
    first_valid = jnp.argmax(mask, axis=-1).astype(jnp.int32)  # (B,)
    invalid = -neg >= jnp.float32(BIG_DIST) / 2
    idx = jnp.where(invalid, first_valid[:, None, None], idx)
    return idx.astype(jnp.int32)


def gather_groups(points: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Gather neighbourhood coordinates: (B,P,C) + (B,G,k) -> (B,G,k,C)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)
