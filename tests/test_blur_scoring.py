"""Gaussian blur vs PIL, scoring vs numpy oracle, coreset invariants."""

import numpy as np
import jax.numpy as jnp
import pytest
from PIL import Image, ImageFilter

from cmdiad_tpu.ops import blur, scoring, coreset


def test_blur_matches_pil_within_quantisation(rng):
    # Pillow 12 only exposes uint8 paths ('L'), which round between passes;
    # our float implementation of the same extended-box algorithm must agree
    # within that rounding envelope.
    x = rng.uniform(0, 255, (64, 64)).astype(np.uint8)
    pil = np.array(Image.fromarray(x, "L").filter(ImageFilter.GaussianBlur(4)))
    ours = np.asarray(blur.pil_gaussian_blur(jnp.asarray(x, jnp.float32), 4.0))
    assert np.abs(ours - pil).max() < 2.0


def test_blur_preserves_mean(rng):
    x = rng.normal(size=(33, 47)).astype(np.float32)
    out = np.asarray(blur.pil_gaussian_blur(jnp.asarray(x), 4.0))
    # clamped-boundary blur is mass-preserving row-stochastically
    np.testing.assert_allclose(
        np.asarray(blur.pil_gaussian_blur(jnp.ones((33, 47)), 4.0)), 1.0,
        rtol=1e-5)
    assert out.shape == x.shape


def test_cdist_l2_matches_numpy(rng):
    a = rng.normal(size=(50, 16)).astype(np.float32)
    b = rng.normal(size=(70, 16)).astype(np.float32)
    ours = np.asarray(scoring.cdist(a, b, "l2"))
    oracle = np.linalg.norm(a[:, None] - b[None], axis=-1)
    np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-4)

    ours1 = np.asarray(scoring.cdist(a, b, "l1"))
    oracle1 = np.abs(a[:, None] - b[None]).sum(-1)
    np.testing.assert_allclose(ours1, oracle1, rtol=1e-4, atol=1e-4)

    oursc = np.asarray(scoring.cdist(a, b, "cos_dist"))
    an = a / np.linalg.norm(a, axis=1, keepdims=True)
    bn = b / np.linalg.norm(b, axis=1, keepdims=True)
    np.testing.assert_allclose(oursc, 1 - an @ bn.T, rtol=1e-4, atol=1e-5)


def test_bank_min_dist_chunked_equals_dense(rng):
    patch = rng.normal(size=(64, 8)).astype(np.float32)
    bank = rng.normal(size=(1000, 8)).astype(np.float32)
    mv, mi = scoring.bank_min_dist(jnp.asarray(patch), jnp.asarray(bank),
                                   chunk=128)
    d = np.linalg.norm(patch[:, None] - bank[None], axis=-1)
    np.testing.assert_allclose(np.asarray(mv), d.min(1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mi), d.argmin(1))


def test_patchcore_score_matches_oracle(rng):
    h = w = 8
    d_feat = 12
    patch = rng.normal(size=(h * w, d_feat)).astype(np.float32)
    bank = rng.normal(size=(200, d_feat)).astype(np.float32)

    s, s_map = scoring.patchcore_score(
        jnp.asarray(patch), jnp.asarray(bank), (h, w), out_size=32)

    # numpy oracle of features.py:225-297
    dist = np.linalg.norm(patch[:, None] - bank[None], axis=-1)
    min_val = dist.min(1)
    min_idx = dist.argmin(1)
    s_idx = min_val.argmax()
    s_star = min_val.max()
    m_test = patch[s_idx]
    m_star = bank[min_idx[s_idx]]
    w_dist = np.linalg.norm(m_star[None] - bank, axis=1)
    nn_idx = np.argsort(w_dist)[:3]
    m_star_knn = np.linalg.norm(m_test - bank[nn_idx[1:]], axis=1)
    dsq = np.sqrt(d_feat)
    w_ = 1 - np.exp(s_star / dsq) / np.sum(np.exp(m_star_knn / dsq))
    np.testing.assert_allclose(float(s), w_ * s_star, rtol=1e-4)
    assert s_map.shape == (32, 32)
    assert np.isfinite(np.asarray(s_map)).all()


def test_greedy_kcenter_matches_oracle(rng):
    z = rng.normal(size=(300, 10)).astype(np.float32)
    got = np.asarray(coreset.greedy_kcenter(jnp.asarray(z), 30,
                                            compute_dtype="FP32"))
    # oracle
    idxs = [0]
    min_d = np.linalg.norm(z - z[0], axis=1)
    for _ in range(29):
        nxt = int(np.argmax(min_d))
        min_d[nxt] = 0
        idxs.append(nxt)
        min_d = np.minimum(min_d, np.linalg.norm(z - z[nxt], axis=1))
    # note ordering: reference updates min-dist with the *previous* pick at
    # the top of each iteration — replicate exactly:
    idxs2 = [0]
    min_d = np.linalg.norm(z - z[0], axis=1)
    last = 0
    for _ in range(29):
        d = np.linalg.norm(z - z[last], axis=1)
        min_d = np.minimum(min_d, d)
        nxt = int(np.argmax(min_d))
        min_d[nxt] = 0
        idxs2.append(nxt)
        last = nxt
    np.testing.assert_array_equal(got, np.array(idxs2))
    assert len(set(got.tolist())) == 30  # distinct selections


def test_sparse_random_projection_shapes(rng):
    x = rng.normal(size=(5000, 512)).astype(np.float32)
    out = coreset.sparse_random_projection(jnp.asarray(x), eps=0.9, seed=0)
    assert out.shape[0] == 5000
    assert out.shape[1] == coreset.johnson_lindenstrauss_min_dim(5000, 0.9)
    with pytest.raises(ValueError):
        coreset.sparse_random_projection(jnp.asarray(x), eps=0.1)


def test_srp_lane_padding_is_distance_exact(rng):
    """pad_lanes appends all-zero columns (exactly zero -> distances over
    the extra dims contribute nothing); the shared columns agree up to the
    matmul's tiling reassociation (ULP-level)."""
    x = rng.normal(size=(500, 512)).astype(np.float32)
    base = np.asarray(coreset.sparse_random_projection(
        jnp.asarray(x), eps=0.9, seed=0))
    padded = np.asarray(coreset.sparse_random_projection(
        jnp.asarray(x), eps=0.9, seed=0, pad_lanes=True))
    assert padded.shape[1] % 128 == 0
    np.testing.assert_allclose(padded[:, :base.shape[1]], base,
                               rtol=2e-6, atol=2e-6)
    np.testing.assert_array_equal(padded[:, base.shape[1]:], 0.0)


@pytest.mark.parametrize("metric", ["l2", "l1", "cos_dist"])
def test_coreset_select_bucketing_prefix_stable(rng, metric):
    """Row padding with copies of row 0 + iteration rounding (the shared-
    program shape buckets) select exactly the unbucketed prefix."""
    x = rng.normal(size=(300, 64)).astype(np.float32) + 1.0
    ref = np.asarray(coreset.coreset_select(
        jnp.asarray(x), 0.1, metric=metric, compute_dtype="FP32",
        bucket_rows=1, bucket_iters=1))          # unbucketed
    got = np.asarray(coreset.coreset_select(
        jnp.asarray(x), 0.1, metric=metric, compute_dtype="FP32",
        bucket_rows=512, bucket_iters=64))       # padded rows + extra iters
    np.testing.assert_array_equal(got, ref)
    assert (got < 300).all()                     # never a padded row


def test_pallas_min_dist_matches_jnp(rng):
    """Fused streaming kernel (interpret mode off-TPU) vs the jnp scan."""
    from cmdiad_tpu.ops.pallas_scoring import bank_min_dist_pallas
    patch = rng.normal(size=(200, 16)).astype(np.float32)
    bank = rng.normal(size=(2048, 16)).astype(np.float32)
    mv, mi = bank_min_dist_pallas(jnp.asarray(patch), jnp.asarray(bank),
                                  tile=256, compute_dtype="float32")
    d = np.linalg.norm(patch[:, None] - bank[None], axis=-1)
    np.testing.assert_allclose(np.asarray(mv), d.min(1), rtol=1e-4, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(mi), d.argmin(1))


def test_pallas_min_dist_int8_envelope(rng):
    """int8-quantised kernel (interpret mode off-TPU) vs the exact f64
    oracle: the per-row symmetric quantisation of the -2·q·bᵀ cross term
    must keep RAW min distances within ~0.5% relative (measured ~0.1%), and
    any argmin disagreement must pick a row whose TRUE distance is within
    that same envelope of the true minimum (a near-tie, not a wrong
    answer).  The shipped refined path must return the selected row's exact
    f32 distance."""
    from cmdiad_tpu.ops.pallas_scoring import bank_min_dist_pallas
    patch = rng.normal(size=(300, 64)).astype(np.float32)
    bank = rng.normal(size=(2048, 64)).astype(np.float32)
    mv, mi = bank_min_dist_pallas(jnp.asarray(patch), jnp.asarray(bank),
                                  tile=256, compute_dtype="int8",
                                  refine=False)
    d = np.linalg.norm(patch[:, None].astype(np.float64)
                       - bank[None].astype(np.float64), axis=-1)
    np.testing.assert_allclose(np.asarray(mv), d.min(1), rtol=5e-3)
    chosen = d[np.arange(300), np.asarray(mi)]
    np.testing.assert_allclose(chosen, d.min(1), rtol=5e-3)

    mv_r, mi_r = bank_min_dist_pallas(jnp.asarray(patch), jnp.asarray(bank),
                                      tile=256, compute_dtype="int8")
    np.testing.assert_array_equal(np.asarray(mi_r), np.asarray(mi))
    np.testing.assert_allclose(np.asarray(mv_r),
                               d[np.arange(300), np.asarray(mi_r)],
                               rtol=1e-5, atol=1e-5)


def test_pallas_min_dist_int8_near_duplicate_rows(rng):
    """ADVICE r4: the int8 cross-term error is ABSOLUTE (proportional to
    per-row magnitudes), so on near-zero min distances — test patches
    (nearly) coincident with bank rows, the normal-patch regime that
    dominates s_map — the RELATIVE error is unbounded and the rtol test
    above proves nothing.  This pins the RAW regime with an absolute bound:
    error <= 10% of the patch row norm (measured ~5-8% worst-case at exact
    coincidence for D in {64, 768}) — and pins the round-5 exact-refinement
    collapsing it: the refined value is the true distance of the selected
    (near-tied) row, <= 2e-2 absolute here vs the raw ~0.5.  The metric-
    level consequence is arbitrated on-chip by
    test_tpu_only.test_int8_end_metric_delta."""
    from cmdiad_tpu.ops.pallas_scoring import bank_min_dist_pallas
    d = 64
    patch = rng.normal(size=(128, d)).astype(np.float32)
    bank = rng.normal(size=(1024, d)).astype(np.float32)
    bank[:128] = patch                                   # exact duplicates
    bank[128:256] = patch + rng.normal(
        size=(128, d)).astype(np.float32) * 1e-3         # near-duplicates
    mv, _ = bank_min_dist_pallas(jnp.asarray(patch), jnp.asarray(bank),
                                 tile=256, compute_dtype="int8",
                                 refine=False)
    true = np.linalg.norm(patch[:, None].astype(np.float64)
                          - bank[None].astype(np.float64), axis=-1).min(1)
    np.testing.assert_allclose(true, 0.0, atol=1e-3)     # regime sanity
    row_norm = np.linalg.norm(patch, axis=1)
    assert np.all(np.abs(np.asarray(mv) - true) <= 0.1 * row_norm), (
        np.max(np.abs(np.asarray(mv) - true) / row_norm))

    mv_r, _ = bank_min_dist_pallas(jnp.asarray(patch), jnp.asarray(bank),
                                   tile=256, compute_dtype="int8")
    assert np.all(np.abs(np.asarray(mv_r) - true) <= 2e-2), (
        np.max(np.abs(np.asarray(mv_r) - true)))


def test_l2_int8_dense_paths_are_exact_l2(rng):
    """'l2_int8' is a KERNEL mode: cdist and every jnp fallback compute it
    as exact f32 l2 (routing doc in ops/scoring.cdist)."""
    a = rng.normal(size=(40, 16)).astype(np.float32)
    b = rng.normal(size=(60, 16)).astype(np.float32)
    np.testing.assert_array_equal(
        np.asarray(scoring.cdist(jnp.asarray(a), jnp.asarray(b), "l2_int8")),
        np.asarray(scoring.cdist(jnp.asarray(a), jnp.asarray(b), "l2")))
    s8, m8 = scoring.patchcore_score(jnp.asarray(a), jnp.asarray(b),
                                     (5, 8), out_size=32, metric="l2_int8")
    s2, m2 = scoring.patchcore_score(jnp.asarray(a), jnp.asarray(b),
                                     (5, 8), out_size=32, metric="l2")
    np.testing.assert_array_equal(np.asarray(s8), np.asarray(s2))
    np.testing.assert_array_equal(np.asarray(m8), np.asarray(m2))


def test_bank_min_dist_without_argmin(rng):
    patch = rng.normal(size=(64, 8)).astype(np.float32)
    bank = rng.normal(size=(1000, 8)).astype(np.float32)
    mv, mi = scoring.bank_min_dist(jnp.asarray(patch), jnp.asarray(bank),
                                   chunk=128, with_argmin=False)
    assert mi is None
    d = np.linalg.norm(patch[:, None] - bank[None], axis=-1)
    np.testing.assert_allclose(np.asarray(mv), d.min(1), rtol=1e-4, atol=1e-4)


def test_bank_nn_table_matches_oracle(rng):
    bank = rng.normal(size=(512, 24)).astype(np.float32)
    table = np.asarray(scoring.bank_nn_table(jnp.asarray(bank), k=3,
                                             chunk=128))
    d = np.linalg.norm(bank[:, None] - bank[None], axis=-1)
    order = np.argsort(d, axis=1, kind="stable")[:, :3]
    # self is always first (distance 0)
    np.testing.assert_array_equal(table[:, 0], np.arange(512))
    np.testing.assert_array_equal(np.sort(table, 1), np.sort(order, 1))


def test_bank_nn_table_masks_padding(rng):
    bank = np.concatenate([rng.normal(size=(100, 8)).astype(np.float32),
                           np.full((28, 8), scoring.PAD_VALUE, np.float32)])
    table = np.asarray(scoring.bank_nn_table(jnp.asarray(bank), k=3,
                                             n_valid=100, chunk=64))
    assert (table[:100] < 100).all()


def test_patchcore_score_nn_table_path_matches(rng):
    """eq.7 via the precomputed NN table == the per-sample m_star distance
    pass (same neighbour indices by construction -> identical scores)."""
    patch = rng.normal(size=(64, 16)).astype(np.float32)
    bank = rng.normal(size=(600, 16)).astype(np.float32)
    table = scoring.bank_nn_table(jnp.asarray(bank), k=3)
    s_ref, map_ref = scoring.patchcore_score(
        jnp.asarray(patch), jnp.asarray(bank), (8, 8), out_size=32)
    s_tab, map_tab = scoring.patchcore_score(
        jnp.asarray(patch), jnp.asarray(bank), (8, 8), out_size=32,
        nn_table=table)
    np.testing.assert_allclose(float(s_tab), float(s_ref), rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(map_tab), np.asarray(map_ref))


def test_patchcore_score_no_overflow_far_patch(rng):
    """A test patch very far from the bank must not NaN the image score.

    The reference's eq.7 (features.py:287) computes exp(s*/sqrt(D)) naively
    and overflows f32 past s* ~ 88.7*sqrt(D) (its own comment at
    features.py:268-270 admits "exp(norm) can give infinities"); the rebuild
    uses the max-subtracted form, which is identical in exact arithmetic and
    finite for any distance.  Observed live: a TPU Point_MAE e2e sample at
    s* ~ 920 scored NaN before this fix."""
    d_feat = 12
    patch = rng.normal(size=(64, d_feat)).astype(np.float32)
    patch[5] += 500.0  # ~1700 sigma away from the bank: exp(s*/sqrt(12)) inf
    bank = rng.normal(size=(200, d_feat)).astype(np.float32)
    s, s_map = scoring.patchcore_score(
        jnp.asarray(patch), jnp.asarray(bank), (8, 8), out_size=32)
    assert np.isfinite(float(s))
    assert np.isfinite(np.asarray(s_map)).all()

    # f64 oracle of the same eq.7 (stable at this magnitude in f64)
    dist = np.linalg.norm(patch[:, None].astype(np.float64)
                          - bank[None].astype(np.float64), axis=-1)
    min_val = dist.min(1)
    s_idx = min_val.argmax()
    s_star = min_val.max()
    m_star = bank[dist[s_idx].argmin()].astype(np.float64)
    w_dist = np.linalg.norm(m_star[None] - bank, axis=1)
    nn_idx = np.argsort(w_dist)[:3]
    m_star_knn = np.linalg.norm(patch[s_idx].astype(np.float64)
                                - bank[nn_idx[1:]], axis=1)
    dsq = np.sqrt(d_feat)
    ln = s_star / dsq - (np.log(np.sum(np.exp(
        m_star_knn / dsq - m_star_knn.max() / dsq)))
        + m_star_knn.max() / dsq)
    w_ = 1.0 - np.exp(ln)
    np.testing.assert_allclose(float(s), w_ * s_star, rtol=1e-4)
