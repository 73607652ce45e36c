"""Inverse-distance-weighted 3-NN feature upsampling.

Replaces ``models/pointnet2_utils.interpolating_points`` (reference :45-75):
group features at G centers are propagated to every point of the full set by
averaging the 3 nearest centers' features with 1/(d²+1e-8) weights (the
reference computes *squared* distances and never square-roots them — we keep
that exactly).

TPU-first shape strategy: instead of interpolating only the variable-length
nonzero points and scattering them back into a 224² grid
(features.py:169-177), we interpolate *every* grid position (static (B,P,3))
and zero out invalid ones with the mask.  The gather of 3 center-features per
point is expressed as a dense (P,G) sparse-weight matmul so the whole op runs
on the MXU instead of a scatter/gather pipeline.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from cmdiad_tpu.ops.knn import pairwise_sqdist


def three_nn_interpolate(points: jnp.ndarray, mask: jnp.ndarray,
                         centers: jnp.ndarray, feats: jnp.ndarray,
                         compute_dtype: str = "float32",
                         out_dtype: str = "float32",
                         use_pallas: bool = True) -> jnp.ndarray:
    """IDW-interpolate center features onto all (masked) points.

    Args:
      points:  (B, P, 3) full padded point set.
      mask:    (B, P) validity.
      centers: (B, G, 3) sampled centers.
      feats:   (B, G, D) per-center features.
      compute_dtype: dtype of the weight x feature contraction in the fused
        kernel path (distances/weights stay f32); the jnp path is f32-only.
      out_dtype: storage dtype of the result — emitting bf16 straight from
        the kernel saves a separate full-pass convert of the (B, P, D)
        splat (measured 0.35 ms/img at B=8).
      use_pallas: route through the fused kernel (the config-level
        ``use_pallas=False`` escape hatch forces the jnp path here too).
    Returns:
      (B, P, D) interpolated features; zero rows where mask is False.
    """
    # Production shapes route through the fused Pallas kernel: the (P, G)
    # distance matrix (205 MB/img at P=50176) never reaches HBM there.
    if (use_pallas and jax.default_backend() == "tpu"
            and centers.shape[1] % 128 == 0 and feats.shape[2] % 128 == 0):
        from cmdiad_tpu.ops.pallas_interp import three_nn_interpolate_pallas
        return three_nn_interpolate_pallas(points, mask, centers, feats,
                                           compute_dtype=compute_dtype,
                                           out_dtype=out_dtype)
    d = pairwise_sqdist(points.astype(jnp.float32), centers.astype(jnp.float32))
    # 3 nearest centers per point by iterative min-extraction — exact, three
    # cheap VPU passes instead of a per-row sort (lax.top_k at these shapes
    # is slow on TPU), and the one-hot masks double as the sparse weight
    # matrix below (no scatter).
    B, P, G = d.shape
    col = jnp.arange(G, dtype=jnp.int32)
    dd = d
    onehots, vals = [], []
    for _ in range(3):
        i = jnp.argmin(dd, axis=-1)                      # (B, P)
        vals.append(jnp.min(dd, axis=-1))
        oh = (col[None, None, :] == i[..., None]).astype(jnp.float32)
        onehots.append(oh)
        dd = dd + oh * jnp.float32(1e30)
    top = jnp.stack(vals, axis=-1)                       # (B, P, 3)
    recip = 1.0 / (top + 1e-8)
    w = recip / jnp.sum(recip, axis=-1, keepdims=True)   # (B, P, 3)

    # Dense (P, G) weight matrix with 3 nonzeros per row -> one MXU matmul.
    wmat = sum(oh * w[..., k:k + 1] for k, oh in enumerate(onehots))
    out = jnp.einsum("bpg,bgd->bpd", wmat, feats.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    out = out * mask[..., None].astype(out.dtype)
    return out.astype(jnp.dtype(out_dtype))
