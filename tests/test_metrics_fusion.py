"""Metrics vs sklearn; AU-PRO vs a direct protocol oracle; OCSVM backends."""

import numpy as np
import pytest

from cmdiad_tpu.metrics import roc_auc_score, calculate_au_pro
from cmdiad_tpu.metrics.au_pro import compute_pro
from cmdiad_tpu.fusion import SGDOneClassSVM


def test_roc_auc_matches_sklearn(rng):
    from sklearn.metrics import roc_auc_score as skl
    labels = (rng.uniform(size=500) > 0.7).astype(int)
    scores = rng.normal(size=500) + labels * 0.5
    assert abs(roc_auc_score(labels, scores) - skl(labels, scores)) < 1e-12
    # with heavy ties
    scores_q = np.round(scores, 1)
    assert abs(roc_auc_score(labels, scores_q) - skl(labels, scores_q)) < 1e-12


def _protocol_oracle_pro(maps, gts, num_thresholds=100):
    """Direct (slow) implementation of the documented MVTec protocol."""
    from scipy.ndimage import label
    comps, ok = [], []
    for gt, pred in zip(gts, maps):
        lab, n = label(gt, np.ones((3, 3), int))
        ok.append(pred[lab == 0])
        for k in range(1, n + 1):
            comps.append(np.sort(pred[lab == k]))
    ok = np.sort(np.concatenate(ok))
    fprs, pros = [1.0], [1.0]
    for pos in np.linspace(0, ok.size - 1, num_thresholds, dtype=int):
        th = ok[pos]
        fpr = 1.0 - (pos + 1) / ok.size
        pro = float(np.mean([np.mean(c > th) for c in comps]))
        fprs.append(fpr)
        pros.append(pro)
    return fprs[::-1], pros[::-1]


def test_pro_curve_matches_protocol_oracle(rng):
    gts, preds = [], []
    for _ in range(4):
        gt = np.zeros((32, 32), int)
        gt[4:10, 4:10] = 1
        gt[20:25, 18:28] = 1
        pred = rng.uniform(size=(32, 32))
        pred[gt == 1] += rng.uniform(0, 1.0)
        gts.append(gt)
        preds.append(pred)
    f1, p1 = compute_pro(preds, gts)
    f2, p2 = _protocol_oracle_pro(preds, gts)
    np.testing.assert_allclose(f1, f2, rtol=1e-12)
    np.testing.assert_allclose(p1, p2, rtol=1e-12)

    au, _ = calculate_au_pro(gts, preds, 0.3)
    assert 0.0 <= au <= 1.0
    au001, _ = calculate_au_pro(gts, preds, 0.01)
    assert 0.0 <= au001 <= 1.0


def test_au_pro_perfect_prediction():
    gt = np.zeros((64, 64), int)
    gt[10:20, 10:20] = 1
    pred = gt.astype(float) + np.random.default_rng(0).uniform(
        0, 1e-3, (64, 64))
    au, _ = calculate_au_pro([gt], [pred], 0.3)
    assert au > 0.97


def test_ocsvm_sklearn_backend_parity(rng):
    from sklearn.linear_model import SGDOneClassSVM as Skl
    x = rng.normal(size=(200, 2)) + 3.0
    ours = SGDOneClassSVM(nu=0.5, max_iter=1000, random_state=42,
                          backend="sklearn").fit(x)
    ref = Skl(nu=0.5, max_iter=1000, random_state=42).fit(x)
    q = rng.normal(size=(50, 2)) + 3.0
    np.testing.assert_allclose(ours.score_samples(q), ref.score_samples(q))


def test_ocsvm_jax_backend_behaviour(rng):
    # inliers around +3, outliers around -3: jax backend must rank inliers
    # higher via score_samples (same convention as sklearn)
    x = rng.normal(size=(300, 2)) * 0.3 + 3.0
    model = SGDOneClassSVM(nu=0.5, max_iter=200, backend="jax").fit(x)
    inl = model.score_samples(rng.normal(size=(50, 2)) * 0.3 + 3.0)
    out = model.score_samples(rng.normal(size=(50, 2)) * 0.3 - 3.0)
    assert np.median(inl) > np.median(out)


def test_ocsvm_jax_backend_score_equivalence(rng):
    """Quantified jax-vs-sklearn agreement on identical fused-score inputs
    (VERDICT r1 item 10): the jax backend approximates sklearn's t0
    heuristic, so coefficients differ by a scale, but the *scores* must be
    rank-equivalent — pinned via Spearman correlation and AUROC delta."""
    train = np.abs(rng.normal(1.0, 0.3, size=(200, 2))) * [1.0, 0.1]
    x_norm = np.abs(rng.normal(1.0, 0.3, size=(60, 2))) * [1.0, 0.1]
    x_anom = np.abs(rng.normal(1.9, 0.45, size=(40, 2))) * [1.0, 0.1]
    x = np.concatenate([x_norm, x_anom])
    y = np.concatenate([np.zeros(60), np.ones(40)])

    scores = {}
    for backend in ("sklearn", "jax"):
        f = SGDOneClassSVM(backend=backend)
        f.fit(train)
        scores[backend] = f.score_samples(x)

    ra = np.argsort(np.argsort(scores["sklearn"]))
    rb = np.argsort(np.argsort(scores["jax"]))
    spearman = np.corrcoef(ra, rb)[0, 1]
    assert spearman > 0.999, spearman
    d_auroc = abs(roc_auc_score(y, scores["sklearn"])
                  - roc_auc_score(y, scores["jax"]))
    assert d_auroc < 1e-3, d_auroc


def test_reset_predictions_clears_accumulators():
    """Contract relied on by warm-eval re-runs (benchmarks/system_throughput)
    and any caller re-evaluating a fitted method: reset_predictions clears
    every prediction accumulator (banks/fusers untouched)."""
    from cmdiad_tpu.methods.base import MemoryBankMethod

    m = MemoryBankMethod.__new__(MemoryBankMethod)
    m.image_preds, m.image_labels = [1.0], [1]
    m.pixel_preds, m.pixel_labels = [np.zeros(4)], [np.zeros(4)]
    m.predictions, m.gts = [np.zeros((2, 2))], [np.zeros((2, 2))]
    m.img_paths, m._pending_preds = ["p"], [("sentinel",)]
    m.banks = {"rgb": "untouched"}
    m.reset_predictions()
    for attr in ("image_preds", "image_labels", "pixel_preds",
                 "pixel_labels", "predictions", "gts", "img_paths",
                 "_pending_preds"):
        assert getattr(m, attr) == [], attr
    assert m.banks == {"rgb": "untouched"}


def test_streamed_stats_only_bank_matches_numpy_oracle(rng):
    """The streaming (sum, sum-squared, count) path used for stats-only
    banks (methods.base._append / _finalize_banks.bank_stats) vs numpy's
    two-pass mean/std(ddof=1) — including a cancellation-hostile case
    (|mean| >> std), since the single-pass variance form loses precision
    there and the f32 per-chunk partials bound accuracy."""
    import jax.numpy as jnp
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.methods.base import MemoryBankMethod

    for mean, std, rtol in ((0.0, 1.0, 1e-5), (5.0, 1.0, 1e-5),
                            (5.0, 0.01, 2e-2)):
        m = MemoryBankMethod.__new__(MemoryBankMethod)
        m.cfg = Config(dataset_path=".", f_coreset=1.0,
                       cache_train_features=False)
        m.fix_cross_stats = False
        m.bank_names = ("rgb", "xyz")
        m._bank_acc = {"rgb": [], "xyz": []}
        m._stats_acc = {}
        m._stats_only_banks = lambda: ("xyz",)
        m.stats, m.banks, m.bank_sizes = {}, {}, {}
        m.coreset_idx, m.nn_tables = {}, {}

        chunks = [rng.normal(mean, std, size=(4096, 32)).astype(np.float32)
                  for _ in range(6)]
        for c in chunks:
            m._append("xyz", c)              # streamed partials
            m._append("rgb", jnp.asarray(c))  # materialised rows
        # cross-wire BOTH stat sources to the streamed xyz bank
        m._finalize_banks(norm_names=(), coreset_names=(),
                          stats_pairs={"rgb": ("xyz", "xyz"),
                                       "xyz": ("xyz", "xyz")},
                          place_names=("rgb",))
        all_vals = np.concatenate([c.reshape(-1) for c in chunks])
        want = (float(all_vals.mean()), float(all_vals.std(ddof=1)))
        got = m.stats["rgb"]
        np.testing.assert_allclose(got[0], want[0], rtol=rtol,
                                   atol=rtol * std)
        np.testing.assert_allclose(got[1], want[1], rtol=rtol)
        # the materialised two-pass path must agree too (same sources)
        assert m.stats["xyz"] == m.stats["rgb"]


def test_stats_source_bank_never_fed_raises():
    """A stats_pairs source with neither rows nor streamed partials must
    fail loudly (silent mean=0/std=0 would NaN the normalised banks)."""
    import pytest
    from cmdiad_tpu.config import Config
    from cmdiad_tpu.methods.base import MemoryBankMethod

    m = MemoryBankMethod.__new__(MemoryBankMethod)
    m.cfg = Config(dataset_path=".", f_coreset=1.0,
                   cache_train_features=False)
    m.fix_cross_stats = False
    m.bank_names = ("rgb",)
    m._bank_acc = {"rgb": []}
    m._stats_acc = {}
    m._stats_only_banks = lambda: ()
    m.stats, m.banks, m.bank_sizes = {}, {}, {}
    m.coreset_idx, m.nn_tables = {}, {}
    with pytest.raises(ValueError, match="no accumulated rows"):
        m._finalize_banks(norm_names=(), coreset_names=())
