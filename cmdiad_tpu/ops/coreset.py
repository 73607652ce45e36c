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


@functools.partial(jax.jit, static_argnames=("n_components", "pad_lanes"))
def _srp_project(x: jnp.ndarray, seed: jnp.ndarray, n_components: int,
                 pad_lanes: bool = False) -> jnp.ndarray:
    """Jitted projection core.  ``pad_lanes`` zero-pads the projection
    matrix's output columns up to a multiple of 128: extra all-zero feature
    columns contribute exactly nothing to every supported distance
    (l2/l1/cos/dot; the shared columns shift only by the matmul's tiling
    reassociation, ULP-level), and keep XLA:TPU off a measured compile cliff — the (627200, 768) ×
    (768, 329) matmul took ~410 s to compile on v5e (odd output lane count
    at huge M), the same matmul padded to 384 output lanes compiles in
    seconds.  The greedy loop's HBM layout pads the minor dim to 128 lanes
    anyway, so the padded columns cost no extra bandwidth."""
    d = x.shape[1]
    density = 1.0 / math.sqrt(d)
    scale = math.sqrt(1.0 / density) / math.sqrt(n_components)
    key = jax.random.PRNGKey(seed)
    u = jax.random.uniform(key, (d, n_components))
    proj = jnp.where(u < density / 2.0, -scale,
                     jnp.where(u < density, scale, 0.0)).astype(jnp.float32)
    if pad_lanes and n_components % 128:
        proj = jnp.pad(proj, ((0, 0), (0, 128 - n_components % 128)))
    return jnp.dot(x.astype(jnp.float32), proj,
                   preferred_element_type=jnp.float32)


def sparse_random_projection(x: jnp.ndarray, eps: float = 0.9,
                             seed: int = 0, n_components: int | None = None,
                             pad_lanes: bool = False):
    """Achlioptas/Li sparse random projection, density = 1/sqrt(D).

    Args:
      x: (N, D) bank.
      pad_lanes: zero-pad the output dim to a 128 multiple (see
        ``_srp_project`` — distance-exact, avoids an XLA compile cliff).
    Returns:
      (N, D') projected bank (float32); D' = JL dim (padded if requested).
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
    return _srp_project(x, jnp.uint32(seed), n_components,
                        pad_lanes=pad_lanes)


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


@functools.partial(jax.jit, static_argnames=("n_select", "iters", "metric",
                                             "compute_dtype", "pad"))
def _greedy_bucketed(z, n_select: int, iters: int, metric: str,
                     compute_dtype: str, pad: int):
    """Row-pad + greedy scan + prefix slice as ONE jitted program.

    The eager form of the bucketing (jnp.concatenate + broadcast_to before
    the scan, idxs[:n_select] after it) paid one first-use remote compile
    PER EAGER OP PER PROCESS on the axon backend — eager compiles there are
    seconds-to-minutes and bypass every cache (CLAUDE.md), which is pure
    cold-fit latency.  Same math, same scan program inlined."""
    if pad:
        z = jnp.concatenate(
            [z, jnp.broadcast_to(z[0], (pad, z.shape[1]))], axis=0)
    return greedy_kcenter(z, iters, metric=metric,
                          compute_dtype=compute_dtype)[:n_select]


def coreset_select(bank: jnp.ndarray, f_coreset: float, eps: float = 0.9,
                   seed: int = 0, metric: str = "l2",
                   compute_dtype: str = "FP16",
                   bucket_rows: int = 65536,
                   bucket_iters: int = 8192) -> jnp.ndarray:
    """Full reference pipeline: SRP (with fallback) + greedy k-center.

    Shape bucketing: greedy farthest-first selection is PREFIX-STABLE, so
    the compiled scan can be shared across classes of different bank sizes
    by (a) padding the projected bank's rows up to ``bucket_rows`` with
    copies of row 0 — a duplicate of the first center holds running
    min-distance 0 under every supported metric (l2/l1/cos) and can never
    win the argmax while a real candidate remains — and (b) rounding the
    iteration count up to ``bucket_iters`` and slicing the extra picks off.
    Selection is exactly the unbucketed prefix; without this, every class
    recompiles the 60k-iteration scan (remote compiles on this backend are
    multi-second to multi-minute and bypass the persistent cache).

    Returns selected row indices (int32, length int(f_coreset * N)).
    """
    n = bank.shape[0]
    n_select = int(f_coreset * n)
    try:
        # pad_lanes: distance-exact zero feature columns (see _srp_project);
        # also buckets the projected width across classes (JL dims land in
        # the same 128 multiple for a wide range of N)
        z = sparse_random_projection(bank, eps=eps, seed=seed, pad_lanes=True)
    except ValueError:
        z = bank.astype(jnp.float32)
    if metric in ("l2", "l1", "cos_dist") and bucket_rows > 1:
        pad = (-n) % bucket_rows
        iters = min(-(-n_select // bucket_iters) * bucket_iters, n)
    else:
        pad = 0
        iters = n_select
    return _greedy_bucketed(z, n_select, iters, metric=metric,
                            compute_dtype=compute_dtype, pad=pad)
