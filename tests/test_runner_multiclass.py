"""Multi-class orchestration: shared compiled state + pipelined IO.

VERDICT r1 item 4: the reference rebuilds the whole model per class
(main.py:22-32); ``run_detection`` must share one backbone so jitted
programs trace once for the whole run, and per-class marginal cost shows no
re-trace spikes.  Compilation stability is asserted directly via the jit
trace-cache sizes of every program in the hot path.
"""

import numpy as np
import pytest

from cmdiad_tpu.config import Config
from cmdiad_tpu.data.synthetic import make_synthetic_dataset
from cmdiad_tpu.models.backbone import DualBackbone
from cmdiad_tpu.models.vit import ViTConfig
from cmdiad_tpu.models.point_mae import PointMAEConfig
from cmdiad_tpu.runner import CMDIADRunner, run_detection

SIZE = 64
CLASSES = ("widget", "gadget")


@pytest.fixture(scope="module")
def dataset_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_mc")
    return make_synthetic_dataset(str(root), class_names=CLASSES, size=SIZE,
                                  n_train=4, n_test_good=2, n_test_bad=2)


def _small_backbone():
    return DualBackbone(
        vit_config=ViTConfig(img_size=SIZE, patch_size=8, embed_dim=32,
                             depth=2, num_heads=2),
        pm_config=PointMAEConfig(num_group=32, group_size=16, encoder_dims=16,
                                 trans_dim=16, depth=2, num_heads=2,
                                 fetch_idx=(0, 1)),
        use_pallas=False, image_size=SIZE)


def _cfg(**kw):
    base = dict(method_name="DINO+Point_MAE", dataset_path="", rgb_size=SIZE,
                xyz_size=SIZE, gt_size=SIZE, f_coreset=0.5, max_sample=10,
                batch_size=2)
    base.update(kw)
    return Config(**base)


def _cache_sizes():
    from cmdiad_tpu.methods import base as mbase
    return {
        "rgb_patches": DualBackbone.rgb_patches._cache_size(),
        "xyz_patches": DualBackbone.xyz_patches._cache_size(),
        "score_one": mbase._score_one._cache_size(),
        "score_batch": mbase._score_batch._cache_size(),
    }


def test_run_detection_no_per_class_retrace(dataset_root):
    cfg = _cfg(dataset_path=dataset_root)
    bb = _small_backbone()
    snapshots = []

    def on_done(cls, metrics, timings):
        snapshots.append((cls, _cache_sizes()))

    results = run_detection(cfg, list(CLASSES), backbone=bb,
                            params=bb.init_params(0), on_class_done=on_done)
    assert set(results) == set(CLASSES)
    for cls in CLASSES:
        for k in ("image_rocauc", "pixel_rocauc", "au_pro", "au_pro_001"):
            assert 0.0 <= results[cls][k] <= 1.0

    # class 2 must add ZERO new trace-cache entries in the hot path
    assert snapshots[0][1] == snapshots[1][1], snapshots


def test_run_detection_matches_plain_runner(dataset_root):
    """Preloaded-sample orchestration must not change the numbers."""
    cfg = _cfg(dataset_path=dataset_root)
    bb = _small_backbone()
    params = bb.init_params(0)
    res = run_detection(cfg, ["widget"], backbone=bb, params=params)

    runner = CMDIADRunner(cfg, backbone=bb, params=params)
    runner.fit("widget")
    ref = runner.evaluate("widget")
    for k in ref:
        assert abs(res["widget"][k] - ref[k]) < 1e-9, (k, res, ref)


def test_run_detection_no_preload(dataset_root):
    cfg = _cfg(dataset_path=dataset_root, preload_next_class=False)
    bb = _small_backbone()
    res = run_detection(cfg, list(CLASSES), backbone=bb,
                        params=bb.init_params(0))
    assert set(res) == set(CLASSES)
