"""Full-chain differential test of the method layer vs the reference.

test_reference_parity pins the scoring *core* (compute_single_s_s_map); this
file pins the ORCHESTRATION around it as one chain, using the reference's own
``DoubleRGBPointFeatures``: identical injected features are pushed through

    add_sample_to_mem_bank -> run_coreset (Q1 cross-wired stats,
    multiple_features.py:877-880) -> add_sample_to_late_fusion_mem_bank
    (λ-weighting, :921-924) -> run_late_fusion (OCSVM fit, features.py:352-358)
    -> predict/compute_s_s_map (:967-1001) -> calculate_metrics
    (features.py:302-324)

on both sides, and image_preds / pixel_preds / all four metrics are compared.
The reference instance is materialised without its CUDA ``__init__`` (a
subclass whose ``__init__`` only sets the attributes the chain touches);
feature extraction is stubbed out at the same boundary on both sides so every
decision-pipeline line of reference code actually runs.

Coreset parity: with feature dim 96 the JL dimension exceeds D, so BOTH
implementations take the documented SparseRandomProjection ValueError
fallback (features.py:369-370 / ops/coreset.py) and run the greedy k-center
loop on the raw bank — making the f_coreset<1 case exactly comparable without
sharing sklearn's RNG (coreset_dtype='TF32' keeps both loops in f32).
cfg.quantized_blur=True makes the reference's uint8 blur path bit-comparable.
"""

import types

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from ref_oracle import ref_import, ref_import_features
from cmdiad_tpu.config import Config
from cmdiad_tpu.methods.variants import DoubleMethod

D = 96          # feature dim (JL dim at eps=0.9 is ~209 > D -> SRP fallback)
RGB_G = 14      # rgb feature grid (196 patches)
XYZ_G = 28      # xyz feature grid (784 patches)
GT = 224
N_TRAIN = 6


def _make_features(rng):
    """Synthetic per-sample (rgb_patch, xyz_patch) + test masks/labels.

    Separate ``calib`` samples feed the late-fusion pass: reusing the exact
    bank-building samples there (what the reference's two-pass fit does with
    f_coreset=1) makes every pass-2 score pure fp-cancellation noise
    (distance of a bank row to itself), which no two implementations can
    agree on — the production f_coreset=0.1 regime has no such degeneracy.
    """
    def sample(idx, anomalous=False):
        rgb = (rng.normal(size=(RGB_G * RGB_G, D)) * 0.5).astype(np.float32)
        xyz = (rng.normal(size=(XYZ_G * XYZ_G, D)) * 0.5).astype(np.float32)
        mask = np.zeros((GT, GT), np.float32)
        if anomalous:
            r0, c0 = 6 + (idx % 4), 10 + (idx % 5)
            blk = xyz.reshape(XYZ_G, XYZ_G, D)
            blk[r0:r0 + 6, c0:c0 + 6] += 3.0
            xyz = blk.reshape(-1, D)
            rblk = rgb.reshape(RGB_G, RGB_G, D)
            rblk[r0 // 2:(r0 + 6) // 2, c0 // 2:(c0 + 6) // 2] += 2.0
            rgb = rblk.reshape(-1, D)
            scale = GT // XYZ_G
            mask[r0 * scale:(r0 + 6) * scale, c0 * scale:(c0 + 6) * scale] = 1.0
        return rgb, xyz, mask

    feats, tests = {}, []
    for i in range(N_TRAIN):
        r, x, _ = sample(i)
        feats[f"train{i}"] = (r, x)
    for i in range(N_TRAIN):
        r, x, _ = sample(i)
        feats[f"calib{i}"] = (r, x)
    for i in range(3):
        r, x, m = sample(i)
        feats[f"good{i}"] = (r, x)
        tests.append((f"good{i}", m, 0))
    for i in range(3):
        r, x, m = sample(i, anomalous=True)
        feats[f"bad{i}"] = (r, x)
        tests.append((f"bad{i}", m, 1))
    return feats, tests


def _make_ref_double(feats, f_coreset, coreset_dtype="TF32"):
    mf = ref_import("feature_extractors.multiple_features")
    uu = ref_import("utils.utils")
    from sklearn import linear_model

    class RefDouble(mf.DoubleRGBPointFeatures):
        def __init__(self):
            torch.nn.Module.__init__(self)  # skip Features.__init__ (CUDA)
            self.args = types.SimpleNamespace(
                use_depth=False, save_feature_for_fusion=False,
                save_frgb_xyz=False, save_rgb_fxyz=False,
                save_seg_results=False, save_raw_results=False,
                dist_method_s="l2", dist_method_coreset="l2",
                xyz_s_lambda=1.0, xyz_smap_lambda=1.0,
                rgb_s_lambda=0.1, rgb_smap_lambda=0.1)
            self.class_name = None
            self.f_coreset = f_coreset
            self.coreset_eps = 0.9
            self.coreset_dtype = coreset_dtype
            self.random_state = 5
            self.n_reweight = 3
            self.gt_size = GT
            self.blur = uu.KNNGaussianBlur(4)
            self.resize56 = torch.nn.AdaptiveAvgPool2d((56, 56))
            self.patch_xyz_lib, self.patch_rgb_lib = [], []
            self.xyz_mean = self.xyz_std = self.rgb_mean = self.rgb_std = 0
            self.detect_fuser = linear_model.SGDOneClassSVM(
                random_state=42, nu=0.5, max_iter=1000)
            self.seg_fuser = linear_model.SGDOneClassSVM(
                random_state=42, nu=0.5, max_iter=1000)
            self.s_lib, self.s_map_lib = [], []
            self.image_preds, self.image_labels = [], []
            self.pixel_preds, self.pixel_labels = [], []
            self.gts, self.predictions, self.img_name = [], [], []
            self.ins_id = self.ins_id2 = self.ins_id3 = 0
            self._key = None

        # stub ONLY the feature-extraction boundary (backbone __call__ and
        # the xyz splat); everything downstream is real reference code
        def __call__(self, rgb, xyz, out_type="rgb+xyz"):
            rgb_patch, _ = feats[self._key]
            rgb_map = torch.from_numpy(
                rgb_patch.T.reshape(1, D, RGB_G, RGB_G).copy())
            return [rgb_map], None, None, None, None, None

        def get_xyz_patch(self, *a, **k):
            return torch.from_numpy(feats[self._key][1].copy())

    return RefDouble()


class InjectedDouble(DoubleMethod):
    """DoubleMethod with extraction stubbed at the same boundary."""

    def __init__(self, cfg, feats):
        super().__init__(cfg, None, None)
        self._feats = feats

    def extract(self, sample, rgb_key="rgb", with_2828=False):
        rgb_patch, xyz_patch = self._feats[sample["key"]]
        return {"rgb_patch": jnp.asarray(rgb_patch)[None],
                "xyz_patch": jnp.asarray(xyz_patch)[None]}


def _cuda_to_cpu_tensor_to(monkeypatch):
    """The reference coreset loop hardcodes .to('cuda') (features.py:397-399);
    map it to cpu so the loop runs here."""
    orig = torch.Tensor.to

    def to(self, *args, **kw):
        args = tuple("cpu" if a == "cuda" else a for a in args)
        if kw.get("device") == "cuda":
            kw = {**kw, "device": "cpu"}
        return orig(self, *args, **kw)

    monkeypatch.setattr(torch.Tensor, "to", to)


def _run_ref(ref, feats, tests):
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
    return ref


def _run_mine(cfg, feats, tests):
    m = InjectedDouble(cfg, feats)
    for i in range(N_TRAIN):
        m.add_sample_to_mem_bank({"key": f"train{i}"}, class_name="cls")
    m.run_coreset()
    for i in range(N_TRAIN):
        m.add_sample_to_late_fusion_mem_bank({"key": f"calib{i}"})
    m.run_late_fusion()
    for key, mask, label in tests:
        m.predict({"key": key}, mask, label, f"{key}.png")
    metrics = m.calculate_metrics()
    return m, metrics


def test_double_method_full_chain_parity(monkeypatch):
    """f_coreset=1: the whole decision chain agrees tightly (no coreset
    randomness in play — every stage is directly comparable)."""
    ref_import_features()  # install CUDA-dep stubs before importing the chain
    _cuda_to_cpu_tensor_to(monkeypatch)
    rng = np.random.default_rng(11)
    feats, tests = _make_features(rng)

    ref = _run_ref(_make_ref_double(feats, 1.0), feats, tests)

    cfg = Config(dataset_path="", class_name="cls",
                 method_name="DINO+Point_MAE", gt_size=GT,
                 f_coreset=1.0, coreset_dtype="TF32",
                 quantized_blur=True, random_state=5)
    mine, metrics = _run_mine(cfg, feats, tests)

    # Q1 cross-wired stats agree
    assert np.isclose(mine.stats["xyz"][0], float(ref.xyz_mean), rtol=1e-6)
    assert np.isclose(mine.stats["xyz"][1], float(ref.xyz_std), rtol=1e-6)
    assert np.isclose(mine.stats["rgb"][0], float(ref.rgb_mean), rtol=1e-6)
    assert np.isclose(mine.stats["rgb"][1], float(ref.rgb_std), rtol=1e-6)

    # banks (normalised) agree row-for-row
    for name, ref_lib in (("xyz", ref.patch_xyz_lib), ("rgb", ref.patch_rgb_lib)):
        n = mine.bank_sizes[name]
        assert n == ref_lib.shape[0]
        np.testing.assert_allclose(np.asarray(mine.banks[name][:n]),
                                   ref_lib.numpy(), rtol=2e-4, atol=2e-5)

    # fused image scores and metrics agree
    ref_preds = np.asarray(ref.image_preds).ravel()
    np.testing.assert_allclose(np.asarray(mine.image_preds), ref_preds,
                               rtol=5e-4, atol=1e-6)
    ref_pixels = np.asarray(ref.pixel_preds)
    my_pixels = np.concatenate(mine.pixel_preds)
    np.testing.assert_allclose(my_pixels, ref_pixels, rtol=5e-3, atol=1e-4)

    assert np.isclose(metrics["image_rocauc"], ref.image_rocauc, atol=1e-6)
    assert np.isclose(metrics["pixel_rocauc"], ref.pixel_rocauc, atol=2e-4)
    assert np.isclose(metrics["au_pro"], ref.au_pro, atol=2e-4)
    assert np.isclose(metrics["au_pro_001"], ref.au_pro_001, atol=2e-3)


def test_double_method_chain_with_coreset_bounded_drift(monkeypatch):
    """f_coreset=0.5: greedy k-center is chaotic near ties — 1e-7 input
    noise eventually flips one argmax and the index suffix diverges, so
    exact parity is not a meaningful target (the reference's own SRP is
    unseeded anyway).  Instead bound the drift: the selected coreset SETS
    overlap heavily and all four metrics stay close."""
    ref_import_features()
    _cuda_to_cpu_tensor_to(monkeypatch)
    rng = np.random.default_rng(11)
    feats, tests = _make_features(rng)

    captured = {}

    ref = _make_ref_double(feats, 0.5)
    orig = ref.get_coreset_idx_randomp

    def capture(z_lib, lib="", **kw):
        idx = orig(z_lib, lib=lib, **kw)
        captured[lib] = idx.numpy()
        return idx

    ref.get_coreset_idx_randomp = capture
    ref = _run_ref(ref, feats, tests)

    cfg = Config(dataset_path="", class_name="cls",
                 method_name="DINO+Point_MAE", gt_size=GT,
                 f_coreset=0.5, coreset_dtype="TF32",
                 quantized_blur=True, random_state=5)
    mine, metrics = _run_mine(cfg, feats, tests)

    for name, key in (("xyz", "patch_xyz_lib"), ("rgb", "patch_rgb_lib")):
        ref_idx = set(captured[key].tolist())
        my_idx = set(mine.coreset_idx[name].tolist())
        assert len(my_idx) == len(ref_idx)
        overlap = len(my_idx & ref_idx) / len(ref_idx)
        assert overlap >= 0.9, (name, overlap)

    assert abs(metrics["image_rocauc"] - ref.image_rocauc) <= 0.05
    assert abs(metrics["pixel_rocauc"] - ref.pixel_rocauc) <= 0.02
    assert abs(metrics["au_pro"] - ref.au_pro) <= 0.03
    assert abs(metrics["au_pro_001"] - ref.au_pro_001) <= 0.03
