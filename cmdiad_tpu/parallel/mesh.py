"""Device mesh + sharding helpers.

The TPU-native replacement for the reference's vestigial
torch.distributed/NCCL plumbing (utils/misc.py:206-238): a
``jax.sharding.Mesh`` over ('data', 'model') with NamedSharding
annotations — XLA inserts the collectives (psum for DP gradients,
all-gathers for sharded banks) over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(shape: Tuple[int, ...] = (),
              axis_names: Sequence[str] = ("data", "model")) -> Mesh:
    """Mesh over the available devices.

    shape () -> all devices on the first axis (pure DP); otherwise the
    product must divide the device count.
    """
    devices = np.asarray(jax.devices())
    if not shape:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    n = int(np.prod(shape))
    return Mesh(devices[:n].reshape(shape), axis_names[:len(shape)])


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Place a pytree of (B, ...) arrays batch-sharded over ``axis``."""
    def put(x):
        spec = P(axis, *([None] * (np.ndim(x) - 1))) if np.ndim(x) else P()
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def shard_rows(mesh: Mesh, array, axis: str = "data"):
    """Shard a (N, D) array's rows (memory-bank sharding)."""
    return jax.device_put(array, NamedSharding(mesh, P(axis, None)))
