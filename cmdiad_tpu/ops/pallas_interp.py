"""Fused 3-NN IDW interpolation Pallas kernel.

The jnp path (ops/interpolate.py) materialises the (P, G) squared-distance
matrix in HBM (205 MB/img at P=50176, G=1024), walks it three times for the
iterative min-extraction, builds a dense one-hot weight matrix, and matmuls
it with the center features — ~2 ms/img of mostly HBM traffic at batch 8.

This kernel tiles the points: per (batch, point-tile) grid step it computes
the distance tile on the MXU, extracts the 3 nearest centers with three
reductions entirely in VMEM/registers, forms the IDW weight tile and
immediately contracts it with the (VMEM-resident) center features — the
distance matrix, one-hots and weight matrix never exist in HBM.

Layout (same trick as ops/pallas_scoring): distances are computed
TRANSPOSED, (G, TILE_P) with centers on sublanes and points on lanes, so the
per-point min/argmin over the 1024 centers is a sublane reduction (no
cross-lane shuffles); the weight tile then feeds the MXU through a
dim-0-contracting dot_general, which handles the transpose natively.

Semantics match ops/interpolate.three_nn_interpolate exactly (squared
distances, 1/(d²+1e-8) weights, first-occurrence argmin tie-breaks, masked
rows zero); reference: models/pointnet2_utils.py:45-75.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_P = 1024


def _kernel(compute_dtype, ptsT_ref, pnorm_ref, c8_ref, cnorm_ref,
            feats_ref, mask_ref, out_ref):
    # blocks: ptsT (1, 8, T), pnorm (1, 1, T), c8 (1, G, 8), cnorm (1, G, 1),
    # feats (1, G, D), mask (1, 1, T), out (1, T, D)
    prod = jnp.dot(c8_ref[0], ptsT_ref[0],
                   preferred_element_type=jnp.float32)          # (G, T)
    # clamp >= 0: the dot-product identity cancels to ~-1e-7 for coincident
    # pairs (group centers ARE input points), and a negative d flips the
    # 1/(d+1e-8) IDW weight to a huge NEGATIVE value — a non-convex
    # combination that blew interpolated features up to 300x the center
    # norms (measured on the production fixture; ops/knn.pairwise_sqdist
    # carries the same clamp for the jnp path)
    d = jnp.maximum(cnorm_ref[0] + pnorm_ref[0] - 2.0 * prod, 0.0)  # (G, T)
    row = lax.broadcasted_iota(jnp.int32, d.shape, 0)

    dd = d
    recips = []
    ohs = []
    for _ in range(3):
        v = jnp.min(dd, axis=0, keepdims=True)                  # (1, T)
        i = jnp.argmin(dd, axis=0).astype(jnp.int32)            # (T,)
        oh = (row == i[None, :]).astype(jnp.float32)            # (G, T)
        recips.append(1.0 / (v + 1e-8))
        ohs.append(oh)
        dd = dd + oh * jnp.float32(1e30)
    wsum = recips[0] + recips[1] + recips[2]
    wmat = (ohs[0] * (recips[0] / wsum) + ohs[1] * (recips[1] / wsum)
            + ohs[2] * (recips[2] / wsum))                      # (G, T)
    # contract over G (dim 0 of both) -> (T, D); MXU takes the transposed
    # lhs natively, no data movement
    # precision pinned: Mosaic rejects bf16 operands with the fp32 contract
    # precision that jax_default_matmul_precision=float32 would inject
    out = lax.dot_general(wmat.astype(compute_dtype),
                          feats_ref[0].astype(compute_dtype),
                          dimension_numbers=(((0,), (0,)), ((), ())),
                          precision=lax.Precision.DEFAULT,
                          preferred_element_type=jnp.float32)   # (T, D)
    out_ref[0] = (out * mask_ref[0].T).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("compute_dtype",
                                               "out_dtype"))
def three_nn_interpolate_pallas(points: jnp.ndarray, mask: jnp.ndarray,
                                centers: jnp.ndarray, feats: jnp.ndarray,
                                compute_dtype: str = "float32",
                                out_dtype: str = "float32"):
    """Fused IDW 3-NN upsample: (B,P,3)+(B,G,3)+(B,G,D) -> (B,P,D).

    Requires G % 128 == 0 and D % 128 == 0 (production: 1024 / 768); the
    caller (ops.interpolate.three_nn_interpolate) falls back to the jnp
    path otherwise.  ``compute_dtype`` applies to the weight x feature
    contraction only (distances/weights are always f32); ``out_dtype`` is
    the storage dtype of the emitted splat (bf16 saves a separate full-pass
    convert downstream).
    """
    B, P, _ = points.shape
    G = centers.shape[1]
    D = feats.shape[2]
    cdt = jnp.dtype(compute_dtype)

    pad = (-P) % TILE_P
    pts = jnp.pad(points.astype(jnp.float32), ((0, 0), (0, pad), (0, 0)))
    msk = jnp.pad(mask.astype(jnp.float32), ((0, 0), (0, pad)))
    Pp = P + pad
    n_tiles = Pp // TILE_P

    ptsT = jnp.pad(pts, ((0, 0), (0, 0), (0, 5))).transpose(0, 2, 1)
    pnorm = jnp.sum(pts * pts, axis=2)[:, None, :]              # (B, 1, Pp)
    c8 = jnp.pad(centers.astype(jnp.float32),
                 ((0, 0), (0, 0), (0, 5)))                      # (B, G, 8)
    cnorm = jnp.sum(centers.astype(jnp.float32) ** 2, axis=2)[..., None]
    msk = msk[:, None, :]                                       # (B, 1, Pp)

    out = pl.pallas_call(
        functools.partial(_kernel, cdt),
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec((1, 8, TILE_P), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_P), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 8), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, 1), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, G, D), lambda b, t: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, TILE_P), lambda b, t: (b, 0, t),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, TILE_P, D), lambda b, t: (b, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Pp, D), jnp.dtype(out_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.default_backend() != "tpu",
    )(ptsT, pnorm, c8, cnorm, feats.astype(jnp.float32), msk)
    return out[:, :P]
