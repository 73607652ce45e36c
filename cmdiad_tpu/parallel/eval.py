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
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cmdiad_tpu.ops.scoring import patchcore_score, cdist


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


def sharded_bank_min_dist(mesh: Mesh, patch: jnp.ndarray, bank: jnp.ndarray,
                          metric: str = "l2"):
    """(min distance, argmin) over a row-sharded bank.

    bank rows are sharded over the 'data' axis; the patch is replicated.
    XLA inserts the cross-shard min/argmin all-reduce.
    """
    patch = jax.device_put(patch, NamedSharding(mesh, P()))
    bank = jax.device_put(bank, NamedSharding(mesh, P("data", None)))

    @jax.jit
    def f(patch, bank):
        d = cdist(patch, bank, metric)
        return jnp.min(d, axis=1), jnp.argmin(d, axis=1).astype(jnp.int32)

    with mesh:
        return f(patch, bank)
