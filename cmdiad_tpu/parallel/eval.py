"""Multi-device evaluation parallelism.

Two independent axes the reference leaves on the table (SURVEY.md §2.4):

  * data-parallel eval — shard a batch of test samples over the mesh 'data'
    axis; each device scores its samples against the replicated bank
    (replaces the reference's strictly batch-1 eval loop, dataset.py:377);
  * bank sharding — for banks too large to replicate (or to split the
    distance matmul), shard bank *rows* over the mesh; XLA turns the row-wise
    min/argmin into per-shard partial reductions + an all-reduce over ICI
    (the memory-bank analogue of sequence parallelism, SURVEY.md §5).

Everything is plain jit + NamedSharding: no hand-written collectives.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmdiad_tpu.ops.scoring import (patchcore_score, patchcore_finish, cdist,
                                    use_scoring_kernel)


def dp_score_batch(mesh: Mesh, patches: jnp.ndarray, bank: jnp.ndarray,
                   feat_hw: Tuple[int, int], out_size: int = 224,
                   metric: str = "l2", n_reweight: int = 3):
    """Score a batch of samples data-parallel.

    Args:
      patches: (B, Np, D) normalised patch sets, B divisible by the mesh's
        data axis; bank: (Nb, D) replicated.
    Returns:
      s (B,), s_map (B, out_size, out_size).
    """
    patches = jax.device_put(patches, NamedSharding(mesh, P("data", None, None)))
    bank = jax.device_put(bank, NamedSharding(mesh, P()))

    @functools.partial(jax.jit, static_argnames=("feat_hw", "out_size",
                                                 "metric", "n_reweight"))
    def score(patches, bank, feat_hw, out_size, metric, n_reweight):
        return jax.vmap(lambda p: patchcore_score(
            p, bank, feat_hw, out_size=out_size, metric=metric,
            n_reweight=n_reweight))(patches)

    with mesh:
        return score(patches, bank, feat_hw, out_size, metric, n_reweight)


# THE kernel-routing gate lives in ops/scoring (single source of truth);
# each shard consults it with its LOCAL row count.
_use_scoring_kernel = use_scoring_kernel


@functools.lru_cache(maxsize=None)
def _sharded_min_fn(mesh: Mesh, batched: bool, metric: str, use_kernel: bool):
    """shard_map'd (min, argmin) over a row-sharded bank.

    GSPMD has no partitioning rule for Mosaic custom calls, so the sharded-
    bank regime — the exact regime banks are too big for one chip and the
    streaming kernel matters most — previously fell back to a dense
    HBM-materialised distance matrix.  Under shard_map each device runs the
    kernel on its LOCAL bank shard (one bank stream at ~99% bf16 peak), then
    a tiny (n_dev, Np) all-gather + min picks the global winner; ties break
    to the lowest shard, matching jnp.argmin's first-occurrence rule.

    Returns a shard_map-wrapped callable (patch, bank_local) usable inside
    jit: patch replicated (Np, D) or (B, Np, D), bank rows P('data').
    """
    from jax import shard_map

    def body(patch, bank_local):
        shard = lax.axis_index("data")
        local_rows = bank_local.shape[0]

        def one(p):
            if use_kernel:
                from cmdiad_tpu.ops.pallas_scoring import bank_min_dist_pallas
                return bank_min_dist_pallas(
                    p, bank_local,
                    compute_dtype="int8" if metric == "l2_int8"
                    else "bfloat16")
            d = cdist(p, bank_local, metric)
            return jnp.min(d, axis=1), jnp.argmin(d, axis=1).astype(jnp.int32)

        if batched:
            # sequential over samples: each kernel call already streams the
            # whole local shard; vmapping a whole-array-BlockSpec pallas_call
            # would stage every sample's operands in VMEM at once
            mv, mi = lax.map(one, patch)
        else:
            mv, mi = one(patch)
        mi = mi + shard * local_rows
        all_v = lax.all_gather(mv, "data")          # (n_dev, [B,] Np)
        all_i = lax.all_gather(mi, "data")
        k = jnp.argmin(all_v, axis=0)
        return (jnp.take_along_axis(all_v, k[None], axis=0)[0],
                jnp.take_along_axis(all_i, k[None], axis=0)[0])

    # jit here (not per call): the lru_cache makes the jitted callable
    # stable, so repeated sharded_bank_min_dist calls reuse one trace
    return jax.jit(shard_map(body, mesh=mesh,
                             in_specs=(P(), P("data", None)),
                             out_specs=(P(), P()), check_vma=False))


def sharded_bank_min_dist(mesh: Mesh, patch: jnp.ndarray, bank: jnp.ndarray,
                          metric: str = "l2"):
    """(min distance, argmin) over a row-sharded bank.

    bank rows are sharded over the 'data' axis; the patch is replicated.
    Each device reduces its own shard (via the streaming Mosaic kernel when
    ``_use_scoring_kernel`` — see ``_sharded_min_fn``), then one all-gather
    combines the per-shard winners.
    """
    n_dev = mesh.shape["data"]
    assert bank.shape[0] % n_dev == 0, (bank.shape, n_dev)
    patch = jax.device_put(patch, NamedSharding(mesh, P()))
    bank = jax.device_put(bank, NamedSharding(mesh, P("data", None)))
    fn = _sharded_min_fn(mesh, patch.ndim == 3, metric,
                         _use_scoring_kernel(bank.shape[0] // n_dev, metric))
    with mesh:
        return fn(patch, bank)


@functools.lru_cache(maxsize=None)
def sharded_score_batch_fn(mesh: Mesh, feat_hw, out_size: int, metric: str,
                           n_reweight: int, use_kernel: bool,
                           quantized_blur: bool = False):
    """Batched patchcore scoring against a row-sharded bank, kernel-speed.

    One jitted program: the bank min-distance pass runs per shard inside
    shard_map (Mosaic kernel on TPU — see ``_sharded_min_fn``), and the
    scoring tail (eq.7 reweight, bilinear, blur — one-row gathers and single
    matvecs over the bank) stays in GSPMD-land where the row sharding
    partitions it automatically.  Not valid for cos_dist (PAD_VALUE rows
    are only value-far under l2/l1; cos needs index masking in the min pass).

    Returns callable (patches (B, Np, D), bank, mean, std, n_valid,
    nn_table) -> (s (B,), s_map (B, out, out)).
    """
    assert metric != "cos_dist"
    min_fn = _sharded_min_fn(mesh, True, metric, use_kernel)

    def g(patches, bank, mean, std, n_valid, nn_table):
        normed = (patches - mean) / std

        def one(p, v, i):
            return patchcore_finish(p, bank, v, i, feat_hw,
                                    out_size=out_size, metric=metric,
                                    n_reweight=n_reweight, n_valid=n_valid,
                                    quantized_blur=quantized_blur,
                                    nn_table=nn_table)

        mv, mi = min_fn(normed, bank)
        return jax.vmap(one)(normed, mv, mi)

    return jax.jit(g)
