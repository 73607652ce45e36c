"""Full-chain differential test of the single-modal method layer vs the
reference's own ``RGBFeatures`` (multiple_features.py:28-124).

Complements the Double (test_method_chain_parity) and MTFI
(test_mtfi_chain_parity) chains: the single-bank flavour has its own
orchestration — non-cross-wired stats (rgb mean AND std from the rgb lib,
:38-41), a ONE-column score vector through both OCSVMs (:63-65), and a
predict path that rebuilds the patch straight from the feature maps
(:74-76).  Identical injected features drive both sides through
bank -> coreset -> late fusion -> predict -> metrics.
"""

import types

import numpy as np
import torch

import jax.numpy as jnp

from ref_oracle import ref_import, ref_import_features
from cmdiad_tpu.config import Config
from cmdiad_tpu.methods.variants import RGBMethod

D = 96
RGB_G = 14
GT = 224
N_TRAIN = 6


def _make_features(rng):
    def sample(idx, anomalous=False):
        rgb = (rng.normal(size=(RGB_G * RGB_G, D)) * 0.5).astype(np.float32)
        mask = np.zeros((GT, GT), np.float32)
        if anomalous:
            r0, c0 = 3 + (idx % 3), 5 + (idx % 4)
            blk = rgb.reshape(RGB_G, RGB_G, D)
            blk[r0:r0 + 4, c0:c0 + 4] += 3.0
            scale = GT // RGB_G
            mask[r0 * scale:(r0 + 4) * scale,
                 c0 * scale:(c0 + 4) * scale] = 1.0
        return rgb, mask

    feats, tests = {}, []
    for i in range(N_TRAIN):
        feats[f"train{i}"] = sample(i)[0]
    for i in range(N_TRAIN):
        feats[f"calib{i}"] = sample(i)[0]
    for i in range(3):
        r, m = sample(i)
        feats[f"good{i}"] = r
        tests.append((f"good{i}", m, 0))
    for i in range(3):
        r, m = sample(i, anomalous=True)
        feats[f"bad{i}"] = r
        tests.append((f"bad{i}", m, 1))
    return feats, tests


def _make_ref_rgb(feats):
    mf = ref_import("feature_extractors.multiple_features")
    uu = ref_import("utils.utils")
    from sklearn import linear_model

    class RefRGB(mf.RGBFeatures):
        def __init__(self):
            torch.nn.Module.__init__(self)
            self.args = types.SimpleNamespace(
                save_seg_results=False, save_raw_results=False,
                dist_method_s="l2", dist_method_coreset="l2",
                rgb_s_lambda=0.7, rgb_smap_lambda=0.4)
            self.class_name = None
            self.f_coreset = 1.0
            self.coreset_eps = 0.9
            self.coreset_dtype = "TF32"
            self.random_state = 5
            self.n_reweight = 3
            self.gt_size = GT
            self.blur = uu.KNNGaussianBlur(4)
            self.patch_rgb_lib = []
            self.rgb_mean = self.rgb_std = 0
            self.detect_fuser = linear_model.SGDOneClassSVM(
                random_state=42, nu=0.5, max_iter=1000)
            self.seg_fuser = linear_model.SGDOneClassSVM(
                random_state=42, nu=0.5, max_iter=1000)
            self.s_lib, self.s_map_lib = [], []
            self.image_preds, self.image_labels = [], []
            self.pixel_preds, self.pixel_labels = [], []
            self.gts, self.predictions, self.img_name = [], [], []
            self._key = None

        # stub ONLY the extraction boundary.  predict() rebuilds the patch
        # from the raw feature maps (torch.cat + reshape.T,
        # multiple_features.py:74-76), so __call__ must return a REAL
        # (1, D, g, g) map whose flattening equals the injected patch.
        def __call__(self, rgb, xyz=None, out_type="rgb+xyz"):
            patch = feats[self._key]
            fmap = torch.from_numpy(
                patch.T.reshape(1, D, RGB_G, RGB_G).copy())
            return [fmap], None, None, None, None, None

        def get_rgb_patch(self, maps):
            patch = torch.cat(maps, 1)
            patch = patch.reshape(patch.shape[1], -1).T
            return patch, patch

    return RefRGB()


class InjectedRGB(RGBMethod):
    def __init__(self, cfg, feats):
        super().__init__(cfg, None, None)
        self._feats = feats

    def extract(self, sample, rgb_key="rgb", with_2828=False):
        return {"rgb_patch": jnp.asarray(self._feats[sample["key"]])[None]}


def test_rgb_method_full_chain_parity(monkeypatch):
    ref_import_features()
    rng = np.random.default_rng(31)
    feats, tests = _make_features(rng)

    ref = _make_ref_rgb(feats)
    stub = [torch.zeros(1, 3, 8, 8), torch.rand(1, 3, 8, 8) + 0.1, None]
    for i in range(N_TRAIN):
        ref._key = f"train{i}"
        ref.add_sample_to_mem_bank(list(stub), class_name="cls")
    ref.run_coreset()
    for i in range(N_TRAIN):
        ref._key = f"calib{i}"
        ref.add_sample_to_late_fusion_mem_bank(list(stub))
    ref.run_late_fusion()
    for key, mask, label in tests:
        ref._key = key
        ref.predict(list(stub), torch.from_numpy(mask), label, f"{key}.png")
    ref.calculate_metrics()

    cfg = Config(dataset_path="", class_name="cls", method_name="DINO",
                 gt_size=GT, f_coreset=1.0, coreset_dtype="TF32",
                 quantized_blur=True, random_state=5,
                 rgb_s_lambda=0.7, rgb_smap_lambda=0.4)
    mine = InjectedRGB(cfg, feats)
    for i in range(N_TRAIN):
        mine.add_sample_to_mem_bank({"key": f"train{i}"}, class_name="cls")
    mine.run_coreset()
    for i in range(N_TRAIN):
        mine.add_sample_to_late_fusion_mem_bank({"key": f"calib{i}"})
    mine.run_late_fusion()
    for key, mask, label in tests:
        mine.predict({"key": key}, mask, label, f"{key}.png")
    metrics = mine.calculate_metrics()

    # single-bank stats: mean AND std from the rgb lib (no cross-wiring)
    assert np.isclose(mine.stats["rgb"][0], float(ref.rgb_mean), rtol=1e-6)
    assert np.isclose(mine.stats["rgb"][1], float(ref.rgb_std), rtol=1e-6)
    n = mine.bank_sizes["rgb"]
    assert n == ref.patch_rgb_lib.shape[0]
    np.testing.assert_allclose(np.asarray(mine.banks["rgb"][:n]),
                               ref.patch_rgb_lib.numpy(),
                               rtol=2e-4, atol=2e-5)

    np.testing.assert_allclose(np.asarray(mine.image_preds),
                               np.asarray(ref.image_preds).ravel(),
                               rtol=5e-4, atol=1e-6)
    ok = np.isclose(np.concatenate(mine.pixel_preds),
                    np.asarray(ref.pixel_preds), rtol=5e-3, atol=1e-4)
    assert ok.mean() > 0.9999, 1 - ok.mean()

    assert np.isclose(metrics["image_rocauc"], ref.image_rocauc, atol=1e-6)
    assert np.isclose(metrics["pixel_rocauc"], ref.pixel_rocauc, atol=2e-4)
    assert np.isclose(metrics["au_pro"], ref.au_pro, atol=2e-4)
    assert np.isclose(metrics["au_pro_001"], ref.au_pro_001, atol=2e-3)
