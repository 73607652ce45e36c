"""Multi-device sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cmdiad_tpu.parallel.mesh import make_mesh, shard_batch, replicate, shard_rows
from cmdiad_tpu.parallel.eval import dp_score_batch, sharded_bank_min_dist
from cmdiad_tpu.ops.scoring import patchcore_score


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8
    return make_mesh((8,), ("data",))


def test_dp_score_batch_matches_sequential(rng, mesh):
    b, npatch, d = 8, 64, 16
    patches = rng.normal(size=(b, npatch, d)).astype(np.float32)
    bank = rng.normal(size=(500, d)).astype(np.float32)

    s_dp, m_dp = dp_score_batch(mesh, jnp.asarray(patches), jnp.asarray(bank),
                                feat_hw=(8, 8), out_size=32)

    for i in range(b):
        s_i, m_i = patchcore_score(jnp.asarray(patches[i]), jnp.asarray(bank),
                                   (8, 8), out_size=32)
        np.testing.assert_allclose(float(s_dp[i]), float(s_i), rtol=1e-4)
        np.testing.assert_allclose(np.asarray(m_dp[i]), np.asarray(m_i),
                                   rtol=1e-3, atol=1e-4)


def test_sharded_bank_min_dist_matches_dense(rng, mesh):
    patch = rng.normal(size=(64, 16)).astype(np.float32)
    bank = rng.normal(size=(800, 16)).astype(np.float32)
    mv, mi = sharded_bank_min_dist(mesh, jnp.asarray(patch), jnp.asarray(bank))
    d = np.linalg.norm(patch[:, None] - bank[None], axis=-1)
    np.testing.assert_allclose(np.asarray(mv), d.min(1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mi), d.argmin(1))


def test_mesh_helpers(rng, mesh):
    batch = {"x": rng.normal(size=(16, 4)).astype(np.float32), "n": 3}
    sharded = shard_batch(mesh, batch)
    assert sharded["x"].sharding.spec == jax.sharding.PartitionSpec("data", None)
    rep = replicate(mesh, {"w": np.ones((3, 3), np.float32)})
    assert rep["w"].sharding.spec == jax.sharding.PartitionSpec()
    rows = shard_rows(mesh, jnp.ones((32, 5)))
    assert rows.sharding.spec == jax.sharding.PartitionSpec("data", None)


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    g.dryrun_multichip(8)
