"""Masked FPS / KNN / interpolation vs tiny numpy oracles.

The oracles implement the documented semantics of the reference's CUDA
dependencies (pointnet2_ops FPS seeded at index 0, KNN_CUDA ascending-sorted
neighbours, pointnet2_utils 3-NN IDW) directly in numpy on the zero-filtered
point list, then results are compared against our masked fixed-capacity ops.
"""

import numpy as np
import pytest

from cmdiad_tpu.ops import fps, knn, interpolate, masked


def _numpy_fps(points, n):
    """Farthest-first on an unpadded point list, seed index 0."""
    idxs = [0]
    min_d = np.full(len(points), 1e10)
    for _ in range(n - 1):
        d = np.sum((points - points[idxs[-1]]) ** 2, axis=1)
        min_d = np.minimum(min_d, d)
        idxs.append(int(np.argmax(min_d)))
    return np.array(idxs)


def _make_masked_points(rng, p=512, n_valid=300):
    pts = np.zeros((p, 3), np.float32)
    pts[:n_valid] = rng.normal(size=(n_valid, 3)).astype(np.float32) + 5.0
    perm = rng.permutation(p)
    return pts[perm], perm


@pytest.mark.parametrize("use_pallas", [False, True])
def test_fps_matches_numpy_oracle(rng, use_pallas):
    pts, perm = _make_masked_points(rng)
    mask = np.asarray(masked.nonzero_point_mask(pts))
    valid_pts = pts[mask]
    oracle_idx = _numpy_fps(valid_pts, 32)
    oracle_centers = valid_pts[oracle_idx]

    centers, idx = fps.farthest_point_sample(
        pts[None], mask[None], 32, use_pallas=use_pallas)
    centers = np.asarray(centers[0])
    # selected centers must be identical points (indices differ by packing)
    np.testing.assert_allclose(centers, oracle_centers, rtol=1e-5, atol=1e-5)
    # every selected index must point at a valid point
    assert mask[np.asarray(idx[0])].all()


@pytest.mark.parametrize("use_pallas", [False, True])
def test_fps_never_selects_invalid(rng, use_pallas):
    pts, _ = _make_masked_points(rng, p=256, n_valid=40)
    mask = np.asarray(masked.nonzero_point_mask(pts))
    _, idx = fps.farthest_point_sample(pts[None], mask[None], 16,
                                       use_pallas=use_pallas)
    assert mask[np.asarray(idx[0])].all()


@pytest.mark.parametrize("p", [256, 200])
@pytest.mark.parametrize("use_pallas", [False, True])
def test_fps_all_invalid_mask_stays_in_range(rng, use_pallas, p):
    """A fully-masked sample (preprocessing can delete every point) must
    yield in-range indices — the kernel's p_total 'no valid point' sentinel
    previously escaped as an out-of-bounds row fetch on the compiled path.
    p=200 covers non-128-multiple capacity, where the earlier p_total-1
    clamp itself landed past the (P, 8) rows block (p_total = 256 > P); the
    sentinel now maps to seed 0, exactly the jnp path's argmax-of-all-false
    seed, so both paths agree bit-for-bit even on this degenerate input."""
    pts = np.zeros((1, p, 3), np.float32)
    mask = np.asarray(masked.nonzero_point_mask(pts))
    assert not mask.any()
    _, idx = fps.farthest_point_sample(pts, mask, 16, use_pallas=use_pallas)
    idx = np.asarray(idx)
    assert ((idx >= 0) & (idx < p)).all()
    assert (idx == 0).all()


def test_fps_batched(rng):
    pts1, _ = _make_masked_points(rng, 256, 100)
    pts2, _ = _make_masked_points(rng, 256, 200)
    batch = np.stack([pts1, pts2])
    mask = np.asarray(masked.nonzero_point_mask(batch))
    c, i = fps.farthest_point_sample(batch, mask, 8, use_pallas=False)
    assert c.shape == (2, 8, 3) and i.shape == (2, 8)


def test_fps_pallas_batched_matches_jnp(rng):
    """The Pallas path batches via the grid (one program per instance;
    vmapping whole-array blocks OOMed VMEM at batch >= 4 on real TPUs) —
    every instance must still match the lax.scan implementation."""
    batch = np.stack([_make_masked_points(rng, 256, n)[0]
                      for n in (40, 100, 160, 200, 256)])
    mask = np.asarray(masked.nonzero_point_mask(batch))
    c_ref, i_ref = fps.farthest_point_sample(batch, mask, 16,
                                             use_pallas=False)
    c_pal, i_pal = fps.farthest_point_sample(batch, mask, 16,
                                             use_pallas=True)
    np.testing.assert_array_equal(np.asarray(i_ref), np.asarray(i_pal))
    np.testing.assert_allclose(np.asarray(c_ref), np.asarray(c_pal))


def test_knn_matches_numpy(rng):
    # method pinned to exact: this is the index-level oracle; the approx
    # path the TPU production runs has its own recall + end-metric coverage
    # (test_tpu_only.test_approx_knn_end_metric_delta)
    pts, _ = _make_masked_points(rng, p=300, n_valid=250)
    mask = np.asarray(masked.nonzero_point_mask(pts))
    centers = pts[mask][:17]
    idx = np.asarray(knn.masked_knn(pts[None], mask[None], centers[None], 5,
                                    method="exact")[0])
    d = np.linalg.norm(centers[:, None] - pts[None], axis=-1)
    d[:, ~mask] = np.inf
    oracle = np.argsort(d, axis=1, kind="stable")[:, :5]
    got_d = np.take_along_axis(d, idx, axis=1)
    want_d = np.take_along_axis(d, oracle, axis=1)
    np.testing.assert_allclose(np.sort(got_d, 1), np.sort(want_d, 1),
                               rtol=1e-4, atol=1e-5)
    # ascending order within each row
    assert (np.diff(got_d, axis=1) >= -1e-5).all()
    # no invalid point selected
    assert mask[idx].all()


def test_three_nn_interpolate_matches_numpy(rng):
    p, g, d = 200, 12, 7
    pts, _ = _make_masked_points(rng, p, 150)
    mask = np.asarray(masked.nonzero_point_mask(pts))
    centers = rng.normal(size=(g, 3)).astype(np.float32) + 5.0
    feats = rng.normal(size=(g, d)).astype(np.float32)

    out = np.asarray(interpolate.three_nn_interpolate(
        pts[None], mask[None], centers[None], feats[None])[0])

    # numpy oracle mirroring pointnet2_utils.interpolating_points on the
    # valid points (squared distances, 1/(d+1e-8) weights, top-3)
    dist = np.sum((pts[:, None] - centers[None]) ** 2, axis=-1)
    order = np.argsort(dist, axis=1)[:, :3]
    d3 = np.take_along_axis(dist, order, axis=1)
    w = 1.0 / (d3 + 1e-8)
    w = w / w.sum(axis=1, keepdims=True)
    oracle = np.einsum("pk,pkd->pd", w, feats[order])
    oracle[~mask] = 0.0

    # atol dominates: the (a²+b²-2ab) fp32 distance expansion can flip the
    # top-3 choice between near-equidistant centers, moving near-zero weights
    np.testing.assert_allclose(out, oracle, rtol=1e-3, atol=1e-4)
    assert np.abs(out[~mask]).max() == 0.0


def test_three_nn_interpolate_pallas_matches_jnp(rng):
    """The fused kernel (used at production G/D multiples of 128) must match
    the jnp path, including masked rows, padding tails and tie-breaks."""
    import jax.numpy as jnp
    from cmdiad_tpu.ops.pallas_interp import three_nn_interpolate_pallas
    b, p, g, d = 2, 300, 128, 128  # p deliberately not a tile multiple
    pts = np.stack([_make_masked_points(rng, p, n)[0] for n in (150, 300)])
    mask = np.asarray(masked.nonzero_point_mask(pts))
    centers = rng.normal(size=(b, g, 3)).astype(np.float32) + 5.0
    feats = rng.normal(size=(b, g, d)).astype(np.float32)
    want = np.asarray(interpolate.three_nn_interpolate(
        pts, mask, centers, feats))
    got = np.asarray(three_nn_interpolate_pallas(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
        jnp.asarray(feats)))
    # kernel dot vs einsum accumulate in different orders (fp32 noise only)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_interpolate_convex_at_coincident_points(rng):
    """Regression: a query point COINCIDENT with a center (every FPS center
    is an input point) plus near-coincident other centers used to blow the
    interpolated feature up ~300x — the (a²+b²-2ab) distance identity
    cancels to ~-1e-7, flipping the 1/(d+1e-8) IDW weight to a huge
    negative value (a non-convex combination).  pointnet2's per-coordinate
    three_nn is non-negative by construction; after the clamp the IDW
    output must stay inside the convex hull of the center features."""
    import jax.numpy as jnp
    from cmdiad_tpu.ops.pallas_interp import three_nn_interpolate_pallas
    b, p, g, d = 1, 256, 128, 128
    # clustered centers at a large offset: |a|²≈|b|²≈190 while the true
    # distances are ~1e-8 — the cancellation regime
    base = np.float32([7.9, 7.9, 7.9])
    centers = (base + rng.normal(size=(b, g, 3)).astype(np.float32) * 1e-4)
    feats = rng.normal(size=(b, g, d)).astype(np.float32)
    pts = np.tile(centers[:, :1], (1, p, 1))        # every query == center 0
    pts += rng.normal(size=pts.shape).astype(np.float32) * 1e-5
    mask = np.ones((b, p), bool)

    hull = np.abs(feats).max() * (1 + 1e-3)
    out_j = np.asarray(interpolate.three_nn_interpolate(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
        jnp.asarray(feats), use_pallas=False))
    assert np.abs(out_j).max() <= hull, np.abs(out_j).max()
    out_k = np.asarray(three_nn_interpolate_pallas(
        jnp.asarray(pts), jnp.asarray(mask), jnp.asarray(centers),
        jnp.asarray(feats)))
    assert np.abs(out_k).max() <= hull, np.abs(out_k).max()


def test_compact_points_preserves_fps_knn(rng):
    """Compaction must leave FPS selections and KNN sets exactly unchanged."""
    import jax.numpy as jnp
    from cmdiad_tpu.ops.masked import compact_points
    pts, _ = _make_masked_points(rng, p=512, n_valid=300)
    batch = jnp.asarray(pts[None])
    m = masked.nonzero_point_mask(batch)
    comp = compact_points(batch, m, 384)
    mc = masked.nonzero_point_mask(comp)
    assert int(mc.sum()) == int(m.sum())
    # order-preserving: the compacted prefix equals the filtered originals
    np.testing.assert_array_equal(np.asarray(comp[0])[: int(m.sum())],
                                  pts[np.asarray(m[0])])

    c1, _ = fps.farthest_point_sample(batch, m, 32, use_pallas=False)
    c2, _ = fps.farthest_point_sample(comp, mc, 32, use_pallas=False)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c2))

    k1 = knn.masked_knn(batch, m, c1, 5, method="exact")
    k2 = knn.masked_knn(comp, mc, c2, 5, method="exact")
    g1 = np.asarray(batch[0])[np.asarray(k1[0])]
    g2 = np.asarray(comp[0])[np.asarray(k2[0])]
    np.testing.assert_allclose(g1, g2, rtol=1e-6)


def test_compact_points_overflow_drops(rng):
    import jax.numpy as jnp
    from cmdiad_tpu.ops.masked import compact_points
    pts, _ = _make_masked_points(rng, p=256, n_valid=200)
    batch = jnp.asarray(pts[None])
    m = masked.nonzero_point_mask(batch)
    comp = compact_points(batch, m, 128)  # capacity < n_valid
    mc = masked.nonzero_point_mask(comp)
    assert int(mc.sum()) == 128           # first 128 in scan order kept
