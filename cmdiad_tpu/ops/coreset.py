"""Coreset subsampling: sparse random projection + greedy k-center.

Replaces ``Features.get_coreset_idx_randomp`` (features.py:360-425), which
runs sklearn's SparseRandomProjection on CPU followed by an n-1-step greedy
farthest-first loop on GPU in FP16.

TPU design:
  * the random projection is a dense (D, D') matmul with a {+s, 0, -s} matrix
    generated on-device from a JAX PRNG key (sklearn's 'auto' density
    1/√D and Johnson–Lindenstrauss dimension are reproduced; the exact
    random matrix necessarily differs — the reference defaults to an
    *unseeded* sklearn RNG anyway, main.py:108-109);
  * the greedy selection keeps the running min-distance vector in fp32 and
    the projected bank in a configurable compute dtype ('FP16' maps to
    bfloat16 — TPUs have no fast fp16 path); each iteration is one
    bandwidth-bound fused distance/min/argmax pass over the bank;
  * multi-chip scale-out lives in cmdiad_tpu.parallel (shard bank rows,
    all-reduce the per-shard argmax).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax


def johnson_lindenstrauss_min_dim(n_samples: int, eps: float) -> int:
    """sklearn-compatible JL lower bound on the projection dimension."""
    denom = (eps ** 2 / 2.0) - (eps ** 3 / 3.0)
    return int(4.0 * math.log(n_samples) / denom)


def sparse_random_projection(x: jnp.ndarray, eps: float = 0.9,
                             seed: int = 0, n_components: int | None = None):
    """Achlioptas/Li sparse random projection, density = 1/sqrt(D).

    Args:
      x: (N, D) bank.
    Returns:
      (N, D') projected bank (float32).
    Raises:
      ValueError if the JL target dimension exceeds D (sklearn raises too;
      the reference catches it and keeps the unprojected bank,
      features.py:369-370 — callers should do the same).
    """
    n, d = x.shape
    if n_components is None:
        n_components = johnson_lindenstrauss_min_dim(n, eps)
    if n_components > d:
        raise ValueError(
            f"JL dim {n_components} > input dim {d}; increase eps")
    density = 1.0 / math.sqrt(d)
    scale = math.sqrt(1.0 / density) / math.sqrt(n_components)
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (d, n_components))
    proj = jnp.where(u < density / 2.0, -scale,
                     jnp.where(u < density, scale, 0.0)).astype(jnp.float32)
    return jnp.dot(x.astype(jnp.float32), proj,
                   preferred_element_type=jnp.float32)


def _dist_to(z: jnp.ndarray, point: jnp.ndarray, metric: str) -> jnp.ndarray:
    if metric == "l2":
        return jnp.linalg.norm(z - point[None, :], axis=1)
    if metric == "l1":
        return jnp.sum(jnp.abs(z - point[None, :]), axis=1)
    if metric == "cos_dist":
        zn = z / jnp.maximum(jnp.linalg.norm(z, axis=1, keepdims=True), 1e-30)
        pn = point / jnp.maximum(jnp.linalg.norm(point), 1e-30)
        return 1.0 - zn @ pn
    if metric == "dot":
        return z @ point
    raise ValueError(metric)


@functools.partial(jax.jit, static_argnames=("n_select", "metric", "compute_dtype"))
def greedy_kcenter(z: jnp.ndarray, n_select: int, metric: str = "l2",
                   compute_dtype: str = "FP16") -> jnp.ndarray:
    """Greedy farthest-first selection of ``n_select`` row indices.

    Matches the reference loop (features.py:372-425): start at row 0, then
    repeatedly (a) distance of every row to the last pick, (b) running min,
    (c) argmax -> next pick, zeroing the picked row's min distance.
    """
    dt = {"FP16": jnp.bfloat16, "TF32": jnp.float32, "FP32": jnp.float32}[compute_dtype]
    zc = z.astype(dt)
    n = z.shape[0]

    # Initial min-distances to row 0 (reference computes this pre-cast in
    # fp32 then casts, features.py:377-391).
    min_d = _dist_to(z.astype(jnp.float32), z[0].astype(jnp.float32), metric)
    min_d = min_d.astype(dt)

    def body(carry, _):
        min_d, last_idx = carry
        last = zc[last_idx]
        d = _dist_to(zc, last, metric)
        min_d = jnp.minimum(d, min_d)
        nxt = jnp.argmax(min_d).astype(jnp.int32)
        min_d = min_d.at[nxt].set(0)
        return (min_d, nxt), last_idx

    (_, last), idxs = lax.scan(
        body, (min_d, jnp.int32(0)), None, length=n_select)
    return idxs.astype(jnp.int32)


def coreset_select(bank: jnp.ndarray, f_coreset: float, eps: float = 0.9,
                   seed: int = 0, metric: str = "l2",
                   compute_dtype: str = "FP16") -> jnp.ndarray:
    """Full reference pipeline: SRP (with fallback) + greedy k-center.

    Returns selected row indices (int32, length int(f_coreset * N)).
    """
    n_select = int(f_coreset * bank.shape[0])
    try:
        z = sparse_random_projection(bank, eps=eps, seed=seed)
    except ValueError:
        z = bank.astype(jnp.float32)
    return greedy_kcenter(z, n_select, metric=metric, compute_dtype=compute_dtype)
