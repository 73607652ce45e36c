"""Masked fixed-capacity point-set utilities.

The reference filters organized point clouds to a variable-length array of
nonzero points on the host (multiple_features.py:10-25), which is hostile to
XLA's static-shape compilation model.  Here point sets keep their full grid
capacity ``P = H*W`` and carry a boolean validity mask; every downstream op
(FPS, KNN, interpolation, bank assembly) threads the mask through so invalid
points can never contaminate a result.
"""

from __future__ import annotations

import jax.numpy as jnp

# Large-but-finite sentinel distance for masked-out candidates.  Using a
# finite value instead of +inf keeps min/top-k NaN-free on the VPU.
#
# Deliberately a Python float, NOT a jnp scalar: a module-level device array
# becomes a captured constant *buffer* in every jit that closes over it, and
# on TPU that blocks XLA from constant-folding the select and fusing the
# distance computation into approx_max_k's PartialReduce — measured 700x
# slower (28 ms vs 0.04 ms) for the 1024x50176 KNN.
BIG_DIST = 1e30


def nonzero_point_mask(points: jnp.ndarray) -> jnp.ndarray:
    """Validity mask for padded point arrays.

    A point is valid iff *all three* coordinates are nonzero — matching the
    reference's ``np.all(unorganized_pc != 0, axis=1)``
    (multiple_features.py:16).

    Args:
      points: (..., P, 3) array.
    Returns:
      (..., P) bool mask.
    """
    return jnp.all(points != 0.0, axis=-1)


def first_valid_index(mask: jnp.ndarray) -> jnp.ndarray:
    """Index of the first valid point along the last axis ((..., P) -> (...)).

    The reference's FPS (pointnet2 CUDA kernel) always seeds from index 0 of
    the zero-filtered array, i.e. the first valid point in scan order.
    """
    return jnp.argmax(mask, axis=-1)


def masked_mean_std(x: jnp.ndarray, mask: jnp.ndarray):
    """Scalar mean/std over rows where mask is True (Bessel-corrected like torch.std)."""
    mask_f = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(mask_f) * x.shape[-1], 1.0)
    mean = jnp.sum(x * mask_f[..., None]) / denom
    var = jnp.sum(((x - mean) ** 2) * mask_f[..., None]) / jnp.maximum(denom - 1.0, 1.0)
    return mean, jnp.sqrt(var)
